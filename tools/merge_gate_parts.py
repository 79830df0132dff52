#!/usr/bin/env python3
"""Merge per-part gate_sensitivity artifacts into one consolidated file.

The consolidated final-tree audit runs in parts (each part is a fresh
invocation of tools/gate_sensitivity.py with GRAFT_ROUND=<round>_pN so
no part overwrites another). This merges them into
bench_history/gate_sensitivity_<round>.json keyed by mutation name —
LATER parts win, so a re-run of a fixed entry supersedes its earlier
SITE-ERROR/GREEN record (the superseded verdicts stay in the part
files for the audit trail).

Usage: python3 tools/merge_gate_parts.py r17 part1.json part2.json ...
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    rnd, parts = sys.argv[1], sys.argv[2:]
    # The consolidated artifact describes the CURRENT mutation table:
    # entries whose name was retired mid-round (e.g. a structurally
    # unobservable variant replaced by an observable one, with the
    # adjudication recorded in the table comments) stay in their part
    # files for the audit trail but are dropped here.
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from gate_sensitivity import MUTATIONS
    current = {m["name"] for m in MUTATIONS}
    merged = {}
    for p in parts:
        for m in json.load(open(p)):
            merged[m["name"]] = m
    dropped = sorted(set(merged) - current)
    missing = sorted(current - set(merged))
    for n in dropped:
        print(f"# dropped (not in current MUTATIONS table): {n} "
              f"[{merged.pop(n)['verdict']}]")
    for n in missing:
        print(f"# WARNING: current mutation never ran in any part: {n}")
    out = list(merged.values())
    art = os.path.join(REPO, "bench_history", f"gate_sensitivity_{rnd}.json")
    with open(art, "w") as fh:
        json.dump(out, fh, indent=1)
    ok = True
    print("| mutation | family | gate queries | verdict |")
    print("|---|---|---|---|")
    for r in out:
        print(f"| {r['name']} | {r['family']} | "
              f"{', '.join(r['queries'])} | {r['verdict']} |")
        if not (r["verdict"].startswith("RED")
                or r["verdict"].startswith("PARTIAL-RED (tolerated")):
            ok = False
    print(f"\n{len(out)} families -> {art}")
    print("ALL RED" if ok else "AUDIT FAIL: non-red verdict present")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
