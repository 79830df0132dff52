#!/usr/bin/env python3
"""Round-over-round bench comparison (VERDICT r4 item 7).

Usage: python3 tools/bench_diff.py OLD NEW [--threshold 2.0]
       python3 tools/bench_diff.py --composite REF RUN [RUN ...]
                                   [--threshold 2.0]

OLD / NEW / REF / RUN are either
  - full-precision detail files written by graft.Bench
    (bench_history/rNN.json or target/bench_detail.json), or
  - driver BENCH_rNN.json artifacts (their truncated stdout "tail" is
    scavenged for #detail lines and the final headline map).

Per the methodology in Bench.scala: per-query comparisons diff the MIN
(noise only ever adds time), and deltas only count as signal when they
exceed the suite-level ratio (host variance is multiplicative and hits
every query in a run), so each query's ratio is normalized by the
old/new total ratio before the threshold is applied.

--composite (VERDICT r18 item 3) is the contaminated-host adjudication
that was assembled by hand in r18: the per-query MIN across N noisy
runs composites into one synthetic quiet run (ambient noise only ever
adds time, and it moves between queries across runs; a code regression
cannot — it slows the same query in every run, so it survives the
min). Prints the composite suite total, the suite ratio vs REF, and
the per-query worst-ratio table; exits nonzero when any query's
composite min exceeds threshold x its REF min after suite-level
normalization. r18's four runs reproduce 83.52 s / ratio 1.14 vs
r17's certified-quiet 73.14 s through this flag.
"""
import json
import re
import sys


def suspect(doc):
    """Host-contamination verdict for one run (r16 forensics: two driver
    rounds in a row read 1.09x/2.04x suite "regressions" that re-benched
    at 1.0x on a quiet host). graft.Bench records /proc/loadavg samples:
    load_start precedes SparkSession creation, so foreign work shows
    there; load_max/runnable_max are per-query samples. The bench's own
    contribution is bounded by its `cpus` budget, so anything well past
    that is another process. Returns a list of reason strings (empty =
    clean or no host block)."""
    host = doc.get("host") if isinstance(doc, dict) else None
    if not host:
        return []
    ncpu = host.get("cpus_host") or 1
    bench_cpus = float(doc.get("cpus", ncpu))
    reasons = []
    if host.get("load_start", 0) > max(2.0, 0.15 * ncpu):
        reasons.append(f"load_start={host['load_start']} before the bench "
                       f"did any work (host has {ncpu} cpus)")
    if host.get("load_max", 0) > bench_cpus + max(2.0, 0.25 * ncpu):
        reasons.append(f"load_max={host['load_max']} exceeds the bench's "
                       f"own {bench_cpus:.0f}-thread budget + margin")
    if host.get("runnable_max", 0) > 1.5 * ncpu:
        reasons.append(f"runnable_max={host['runnable_max']} threads vs "
                       f"{ncpu} cpus: host oversubscribed mid-run")
    # Intra-run instability: contamination the loadavg samples MISS (the
    # r17 final-tree fluke read load_start 0.6 yet ran 2.5x slow). On a
    # quiet host min and median of 3 runs hug each other for every query
    # (clean r17: 0 of 178 queries with median > 1.5x min); a run where
    # several queries' medians detach from their own mins was externally
    # disturbed mid-run, whatever the load samples say.
    qs = doc.get("queries") or {}
    unstable = [q for q, v in qs.items()
                if isinstance(v, dict) and v.get("min", 0) > 0
                and v.get("median", 0) > 1.5 * v["min"]]
    if len(unstable) >= 5:
        reasons.append(f"{len(unstable)} queries with median >1.5x their "
                       f"own min (e.g. {', '.join(sorted(unstable)[:3])}): "
                       "intra-run instability")
    return reasons


def load(path):
    """Return (queries: {name: min_or_median_sec}, total: float|None, precise: bool)."""
    with open(path) as fh:
        raw = fh.read()
    try:
        doc = json.loads(raw)
    except ValueError:
        doc = None
    if isinstance(doc, dict) and "queries" in doc and isinstance(
            next(iter(doc["queries"].values()), None), dict):
        # graft.Bench detail file: {"total":..,"queries":{q:{median,min,spread}}}
        for r in suspect(doc):
            print(f"# SUSPECT RUN {path}: {r}")
        return ({q: v["min"] for q, v in doc["queries"].items()},
                doc.get("total"), True)
    # driver artifact: scavenge the stdout tail
    tail = doc.get("tail", raw) if isinstance(doc, dict) else raw
    qs, total = {}, None
    for m in re.finditer(r'#detail ({.*?})', tail):
        try:
            d = json.loads(m.group(1))
            qs[d["q"]] = d["min"]
        except ValueError:
            pass
    final = re.search(r'{"metric":"total".*}', tail)
    if final:
        try:
            d = json.loads(final.group(0))
            total = d.get("value")
            for q, v in d.get("queries", {}).items():
                qs.setdefault(q, v)  # 2-decimal medians: better than nothing
            # the headline line carries load_start/load_max (r17+): give the
            # tail-scavenged path the same contamination verdict
            host = {"cpus_host": doc.get("cpus") if isinstance(doc, dict)
                    else None,
                    "load_start": d.get("load_start", 0),
                    "load_max": d.get("load_max", 0)}
            if host["cpus_host"] and "load_start" in d:
                for r in suspect({"host": host, "cpus": doc.get("cpus")}):
                    print(f"# SUSPECT RUN {path}: {r}")
        except ValueError:
            pass
    return qs, total, False


def composite(ref_path, run_paths, threshold):
    """Min-composite adjudication across N noisy runs vs a reference."""
    ref_q, ref_t, _ = load(ref_path)
    if not ref_q:
        sys.exit(f"no per-query data in reference {ref_path}")
    runs = []
    for p in run_paths:
        q, t, _ = load(p)
        if not q:
            sys.exit(f"no per-query data in run {p}")
        runs.append((p, q, t))
        print(f"# run {p}: total {t} over {len(q)} queries")
    common = set(ref_q)
    for _, q, _ in runs:
        common &= set(q)
    comp = {q: min(r[1][q] for r in runs) for q in common}
    comp_total = sum(comp.values())
    # the reference 'total' is graft.Bench's sum of medians; fall back to
    # the sum of its per-query values when the field is absent
    ref_total = ref_t if ref_t else sum(ref_q[q] for q in common)
    level = comp_total / ref_total
    print(f"# composite of {len(runs)} runs over {len(common)} common "
          f"queries: {comp_total:.2f}s vs reference {ref_total:.2f}s "
          f"-> suite ratio {level:.2f}")
    rows = []
    for q in common:
        o, n = ref_q[q], comp[q]
        if o <= 0 or n <= 0:
            continue
        rows.append((n / o, q, o, n))
    rows.sort(reverse=True)
    print("# per-query worst ratios (composite min / reference, raw):")
    for ratio, q, o, n in rows[:10]:
        print(f"  {ratio:5.2f}x  {q}: {o:.4f}s -> {n:.4f}s")
    flagged = [(r / level, q, o, n) for r, q, o, n in rows
               if r / level >= threshold]
    if flagged:
        print(f"REGRESSION CANDIDATES (>{threshold}x after suite-level "
              f"normalization by {level:.2f}):")
        for ratio, q, o, n in flagged:
            print(f"  {ratio:5.2f}x  {q}: {o:.4f}s -> {n:.4f}s")
        sys.exit(1)
    print(f"OK: no query beyond {threshold}x its reference after "
          "normalization — a code regression would survive the min; "
          "the suite-level inflation is ambient")


def main():
    argv = sys.argv[1:]
    args, threshold, comp_mode, i = [], 2.0, False, 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            else:  # space-separated form consumes the next token
                i += 1
                threshold = float(argv[i])
        elif a == "--composite":
            comp_mode = True
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    if comp_mode:
        if len(args) < 2:
            sys.exit(__doc__)
        composite(args[0], args[1:], threshold)
        return
    if len(args) != 2:
        sys.exit(__doc__)
    old_q, old_t, old_p = load(args[0])
    new_q, new_t, new_p = load(args[1])
    if not old_q or not new_q:
        sys.exit(f"no per-query data ({len(old_q)} old / {len(new_q)} new)")
    # normalize by the suite-level ratio when both totals are known
    level = (new_t / old_t) if (old_t and new_t) else 1.0
    common = sorted(set(old_q) & set(new_q))
    flagged = []
    for q in common:
        o, n = old_q[q], new_q[q]
        if o <= 0 or n <= 0:
            continue
        ratio = (n / o) / level
        if ratio >= threshold or ratio <= 1.0 / threshold:
            flagged.append((ratio, q, o, n))
    print(f"# bench_diff: {len(common)} common queries "
          f"({'full-precision' if old_p and new_p else 'TAIL-SCAVENGED (2-dec medians)'}), "
          f"suite-level ratio {level:.2f} "
          f"(totals {old_t} -> {new_t}), threshold {threshold}x")
    only_new = sorted(set(new_q) - set(old_q))
    if only_new:
        print(f"# new queries (no prior data): {', '.join(only_new)}")
    gone = sorted(set(old_q) - set(new_q))
    if gone:
        print(f"# disappeared: {', '.join(gone)}")
    if not flagged:
        print("OK: no per-query move beyond threshold after normalization")
        return
    for ratio, q, o, n in sorted(flagged, reverse=True):
        direction = "SLOWER" if ratio > 1 else "faster"
        print(f"{direction} {ratio:5.2f}x  {q}: {o:.4f}s -> {n:.4f}s")
    if any(r > 1 for r, *_ in flagged):
        sys.exit(1)


if __name__ == "__main__":
    main()
