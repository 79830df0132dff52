#!/usr/bin/env python3
"""Fixture boundary-coverage lint (VERDICT r16 item 3).

Three r15/r16 audit findings were the same failure class: a boundary
comparison in main source (`<=`, `>=`, a threshold constant) whose gate
fixture held NO row exactly AT the boundary, so an off-by-one mutation
of the comparison was invisible to the oracle (SemDeDup keep-tie, TTL
expires-at-now, $between lo bound). This lint pins the class:

For each entry it asserts
  1. the boundary comparison still exists in main source (`greps`) —
     so the table cannot silently go stale when code moves, and
  2. the sf0.01 fixture population contains >= 1 row AT the boundary
     (`probe` — DuckDB SQL over the same parquet tables and fixture
     constructions the gates use, returning a single count), or the
     entry carries an explicit `adjudicated` explanation of why the
     boundary is unreachable and what covers it instead.

Inverse checks (`expect_zero`) pin standing ADJUDICATIONS: e.g. Porter
was excluded from BM25-oracle reach because the corpus is
inflection-free — if that ever stops being true, the adjudication is
stale and should be revisited (informational failure).

Usage: python3 tools/boundary_lint.py [sf_dir]   (default sf0.01)
Exit 0 = every entry green; 1 = a boundary lost its row or a grep went
stale.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

CHECKS = [
    dict(
        name="between_lo_bound",
        why="$between is inclusive [lo, hi] (reference src/metadata.rs:"
            "1301-1312); a planted value==10 row makes >= falsifiable",
        greps=[
            ("src/main/scala/graft/filter/FilterCompiler.scala",
             "numCmp(r, lo, _ >= _) && numCmp(r, hi, _ <= _)"),
            # the plant itself (r17): literal lo-bound rows
            ("src/main/scala/graft/queries/FilterQueries.scala",
             '.withColumn("value", lit(10.0))'),
        ],
        # the plant copies rows event_id < 2 — they must exist
        probe="SELECT count(*) FROM events WHERE event_id < 2",
    ),
    dict(
        name="between_hi_bound",
        why="hi-bound row must not depend on the generated data "
            "(r16 relied on one lucky natural value==100 row)",
        greps=[
            ("src/main/scala/graft/queries/FilterQueries.scala",
             '.withColumn("value", lit(100.0))'),
        ],
        probe="SELECT count(*) FROM events WHERE event_id < 2",
    ),
    dict(
        name="ttl_expires_at_now",
        why="lazy expiry keeps rows with ttl > now (strict); the fixture "
            "class ttl==200 at nowEpochS=200 sits exactly at the boundary "
            "(r16 fix)",
        greps=[
            ("src/main/scala/graft/ops/Mutations.scala",
             "col(ttlCol).isNull || col(ttlCol) > nowEpochS"),
            ("src/main/scala/graft/queries/MutationQueries.scala",
             '.when(col("event_id") % 3 === 0, 200L)'),
            ("src/main/scala/graft/queries/MutationQueries.scala",
             "nowEpochS = 200L"),
        ],
        # the ttl==now class: %3 rows not already claimed by the %5 class
        probe="SELECT count(*) FROM events "
              "WHERE event_id % 3 = 0 AND event_id % 5 <> 0",
    ),
    dict(
        name="c4_min_line_words",
        why="the kept/dropped line-length rule is >= minLineWords (5); "
            "the fixture plants a line with EXACTLY five words "
            "(r17, proven RED by c4_min_line_words mutation)",
        greps=[
            ("src/main/scala/graft/pipeline/TextAnalysis.scala",
             "minLineWords: Int = 5"),
            ("src/main/scala/graft/queries/PipelineQueries.scala",
             'lit("exactly five words kept here.")'),
        ],
        # static: the planted literal really has 5 words and terminal punct
        static=lambda: len("exactly five words kept here.".split()) == 5
        and "exactly five words kept here.".endswith("."),
    ),
    dict(
        name="semdedup_keep_tiebreak",
        why="keep-farthest needs centroid distances that DIFFER within a "
            "duplicate group; exact copies tie and the rule is "
            "unfalsifiable (r16 fix: near-dup plants at +1/128)",
        greps=[
            ("src/main/scala/graft/pipeline/SemDedup.scala",
             '.orderBy(col("centroid_dist").desc, col("id").asc)'),
            # the near-dup plant: binary-power increment, not exact copy
            ("src/main/scala/graft/queries/PipelineQueries.scala",
             "1/128"),
        ],
        probe="SELECT count(*) FROM embeddings WHERE vec_id < 20",
    ),
    dict(
        name="pack_window_edge",
        why="window_id = floor(before / budget): a doc whose cumulative "
            "'before' is an exact multiple of 512 exercises the edge "
            "(first doc of a window)",
        greps=[
            ("src/main/scala/graft/pipeline/Sampling.scala",
             "floor((offsetCol + withinBefore) / lit(budget))"),
        ],
        probe="""
WITH t AS (SELECT doc_id, len(list_filter(
             string_split_regex(trim(lower(text)), '\\s+'),
             x -> len(x) > 0)) AS n_tok FROM documents),
c AS (SELECT doc_id, coalesce(sum(n_tok) OVER (
        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        0) AS before FROM t)
SELECT count(*) FROM c WHERE before % 512 = 0 AND doc_id > 0""",
    ),
    dict(
        name="span_window_edge",
        why="span slicing cuts ceil(words/20) windows; a doc with word "
            "count an exact multiple of 20 exercises the last-full-span "
            "edge (no ragged tail)",
        greps=[
            ("src/main/scala/graft/pipeline/Dedup.scala",
             "i => array_join(slice(words, i * spanWords + 1, lit(spanWords)), \" \"))"),
        ],
        probe="""
WITH t AS (SELECT len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> len(x) > 0)) AS n FROM documents)
SELECT count(*) FROM t WHERE n % 20 = 0 AND n > 0""",
    ),
    dict(
        name="pii_three_digit_octet",
        why="the IP regex octet class is [0-9]{1,3}; planted IPs "
            "(192.168.1.{doc_id%255}) include 3-digit octets so a {1,2} "
            "mutation is visible (proven RED r17)",
        greps=[
            ("src/main/scala/graft/pipeline/Pii.scala",
             "(?:[0-9]{1,3}\\\\.){3}"),
        ],
        probe="SELECT count(*) FROM documents "
              "WHERE doc_id % 10 = 0 AND doc_id % 255 >= 100 AND doc_id < 200",
    ),
    dict(
        name="porter_inflection_free_corpus",
        why="STANDING ADJUDICATION (r16): corpus-scale BM25 gates cannot "
            "see the stemmer because the sf corpus has no inflected "
            "English; Porter is gated by bm25_stemmed's closed fixture "
            "instead. If inflections ever appear here, revisit.",
        greps=[
            ("src/main/scala/graft/queries/TextQueries.scala",
             "\"bm25_stemmed\""),
        ],
        probe="""
SELECT count(*) FROM (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
  FROM documents) WHERE regexp_matches(t, '(sses|ing|ed)$')""",
        expect_zero=True,
    ),
    dict(
        name="split_threshold_buckets",
        why="splitLabel's `<` thresholds need rows AT both boundary "
            "buckets; 500 docs over 256 buckets left both empty (r17 "
            "finding: split_threshold_incl mutation was GREEN) — the "
            "gate plants ids whose md5 prefixes are exactly 'cc' "
            "(train/val edge) and 'e6' (val/test edge)",
        greps=[
            ("src/main/scala/graft/pipeline/Sampling.scala",
             'when(h < lit(threshold(trainFrac, 2)), "train")'),
            ("src/main/scala/graft/queries/SamplingQueries.scala",
             "UNION ALL SELECT 1000133, 'zz'"),
            ("src/main/scala/graft/queries/SamplingQueries.scala",
             "UNION ALL SELECT 1000020, 'zz'"),
        ],
        static=lambda: __import__("hashlib").md5(b"1000133")
        .hexdigest()[:2] == "cc" and __import__("hashlib").md5(b"1000020")
        .hexdigest()[:2] == "e6",
    ),
    dict(
        name="gopher_alpha_and_count_boundary",
        why="the word-salad corpus holds no doc with alpha-word ratio in "
            "[0.8, 0.95), none with exactly minWords=50 words, and none "
            "with exactly 2 stopwords (r17 finding: alpha-threshold "
            "mutation was GREEN) — doc 900001 is planted at all three",
        greps=[
            ("src/main/scala/graft/pipeline/TextAnalysis.scala",
             'g.getField("_3").cast("double") / nWords >= 0.8'),
            # EVERY line fragment of the planted Scala literal (r18
            # ADVICE: tail-only anchoring let the leading words drift from
            # the copy validated by `static` below). The literal is a
            # 5-line string concat in PipelineQueries.scala:71-75; any
            # edit to any line now fails the lint.
            ("src/main/scala/graft/queries/PipelineQueries.scala",
             "the and pony river stone cloud maple ember quiet forest "
             "meadow "),
            ("src/main/scala/graft/queries/PipelineQueries.scala",
             "copper winter salmon harbor violet timber faint marble "
             "garden "),
            ("src/main/scala/graft/queries/PipelineQueries.scala",
             "sunset prairie willow canyon thunder breeze orchard "
             "crystal "),
            ("src/main/scala/graft/queries/PipelineQueries.scala",
             "lantern pebble shadow spruce falcon harvest juniper cobalt "
             "amber "),
            ("src/main/scala/graft/queries/PipelineQueries.scala",
             "raven tundra velvet saffron indigo myrtle walnut cedar "
             "11 22 33 44 55"),
        ],
        static=lambda: (lambda ws: len(ws) == 50 and sum(
            1 for w in ws if any(c.isalpha() for c in w)) == 45 and sum(
            1 for s in ("the", "be", "to", "of", "and", "that", "have",
                        "with") if s in ws) == 2)(
            ("the and pony river stone cloud maple ember quiet forest "
             "meadow copper winter salmon harbor violet timber faint "
             "marble garden sunset prairie willow canyon thunder breeze "
             "orchard crystal lantern pebble shadow spruce falcon harvest "
             "juniper cobalt amber raven tundra velvet saffron indigo "
             "myrtle walnut cedar 11 22 33 44 55").split()),
    ),
    dict(
        name="gdpr_null_tenant_row",
        why="the erasure filter's null-SAFETY (=!= alone silently drops "
            "null-tenant rows) needs a null-tenant row to observe; every "
            "derived tenant is non-null (r17 finding: gdpr_null_unsafe "
            "mutation was GREEN) — doc 900002 is planted with tenant NULL",
        greps=[
            ("src/main/scala/graft/ops/Tenancy.scala",
             "df.filter(col(tenantCol) =!= tenantId || col(tenantCol)"
             ".isNull)"),
            ("src/main/scala/graft/queries/EnterpriseQueries.scala",
             "UNION ALL SELECT 900002, NULL"),
            ("src/main/scala/graft/queries/EnterpriseQueries.scala",
             'lit(null).cast("string").as("tenant")'),
        ],
        probe="SELECT count(*) FROM documents",
    ),
    dict(
        name="federated_consensus_count_variance",
        why="consensus ordering (count DESC first) is only observable when "
            "pooled counts VARY; with all shards at top-10 every pooled id "
            "was count 2 (r17 finding: ordering mutation was GREEN) — "
            "shard 2 is capped at top-5 so its rank-6..10 ids drop to 1",
        greps=[
            ("src/main/scala/graft/ops/Federated.scala",
             '.orderBy(col("consensus_count").desc, col(distCol).asc,'),
            ("src/main/scala/graft/queries/FederatedQueries.scala",
             "consensusTop5Cap"),
        ],
        probe="""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT g.s, e.vec_id AS id,
         round(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS distance
  FROM embeddings e CROSS JOIN q CROSS JOIN (VALUES (0), (1), (2)) g(s)
  WHERE e.vec_id % 3 = g.s OR e.vec_id % 3 = (g.s + 1) % 3
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY s ORDER BY distance, id) AS rnk
  FROM scored),
top AS (SELECT * FROM ranked
        WHERE rnk <= CASE WHEN s = 2 THEN 5 ELSE 10 END)
SELECT count(*) FROM (
  SELECT id FROM top GROUP BY id HAVING count(*) = 1)""",
    ),
    dict(
        name="merge_patch_key_presence",
        why="value extraction (get_json_object / json_extract_string) "
            "returns NULL for both a REMOVED key and a stored JSON null, "
            "so the RFC-7386 null-delete rule needs the k_present column "
            "read from map_keys/json_keys (r17 finding: null-keep "
            "mutation was GREEN before it)",
        greps=[
            ("src/main/scala/graft/ops/Mutations.scala",
             "if (e.getValue.isNull) merged.remove(e.getKey)"),
            ("src/main/scala/graft/queries/MutationQueries.scala",
             "json_keys(json_merge_patch"),
            ("src/main/scala/graft/queries/MutationQueries.scala",
             "map_keys(from_json("),
        ],
        probe="SELECT count(*) FROM events WHERE event_id < 50",
    ),
    dict(
        name="boilerplate_docfreq_boundary",
        why="boilerplateLines' `df_ >= minDocFreq` needs a line in "
            "EXACTLY minDocFreq=100 distinct docs; the natural hot lines "
            "sit at 500 and 250 (r18 finding: `>` mutation was GREEN) — "
            "'Limited time offer ends soon' is planted in docs 0..99 on "
            "both the Spark builder and the oracle SQL",
        greps=[
            ("src/main/scala/graft/pipeline/Dedup.scala",
             '.filter(col("df_") >= minDocFreq)'),
            ("src/main/scala/graft/queries/PipelineQueries.scala",
             'when(col("doc_id") < 100, lit("Limited time offer ends '
             'soon"))'),
            ("src/main/scala/graft/queries/PipelineQueries.scala",
             "CASE WHEN doc_id < 100 THEN 'Limited time offer ends soon'"),
        ],
        probe="SELECT CASE WHEN count(DISTINCT doc_id) = 100 THEN 1 "
              "ELSE 0 END FROM documents WHERE doc_id < 100",
    ),
    dict(
        name="pitr_asof_timestamp_boundary",
        why="Pitr's as-of filter `timestampMs <= ts` is only observable "
            "when a recovery queries EXACTLY the snapshot timestamp; the "
            "gate's Named-only path never touched the Timestamp branch "
            "(r18 finding: `<` mutation was GREEN) — the gate now also "
            "recovers at Timestamp(1L) == the pinned now()",
        greps=[
            ("src/main/scala/graft/ops/Pitr.scala",
             "snapshots.filter(_.timestampMs <= ts).lastOption"),
            ("src/main/scala/graft/queries/GovernanceQueries.scala",
             "svc.recoverTo(RecoveryTarget.Timestamp(1L))"),
            ("src/main/scala/graft/queries/GovernanceQueries.scala",
             "now = () => 1L"),
        ],
    ),
    dict(
        name="step_decay_age_boundary",
        why="Step decay is INCLUSIVE at age == windowSeconds "
            "(pipeline.rs:404-411); the fetched top-10 had no row AT the "
            "boundary (r18 finding: `<` mutation was GREEN) — vec_id 0 "
            "(rank 1 by construction) is planted at inserted_at 300000 == "
            "now - max_age on both sides",
        greps=[
            ("src/main/scala/graft/ops/Pipeline.scala",
             "when(age <= windowSeconds, 1.0)"),
            ("src/main/scala/graft/queries/SearchPipelineQueries.scala",
             'when(col("vec_id") === 0, lit(300000L))'),
            ("src/main/scala/graft/queries/SearchPipelineQueries.scala",
             "CASE WHEN c.vec_id = 0 THEN 300000"),
        ],
    ),
    dict(
        name="sample_hash_threshold_boundary",
        why="sampleByHash keeps prefix < threshold (EXCLUSIVE); no natural "
            "doc hashes exactly to threshold(0.1,4)='1999' (r18 finding: "
            "`<=` mutation was GREEN) — doc 1015939 is planted at the "
            "boundary on both sides",
        greps=[
            ("src/main/scala/graft/pipeline/Sampling.scala",
             "df.filter(hashPrefix(idCol, 4) < lit(threshold(fraction, "
             "4)))"),
            ("src/main/scala/graft/queries/SamplingQueries.scala",
             'lit(1015939L).as("doc_id")'),
            ("src/main/scala/graft/queries/SamplingQueries.scala",
             "UNION ALL SELECT 1015939, 'zz'"),
        ],
        static=lambda: __import__("hashlib").md5(b"1015939")
        .hexdigest()[:4] == "1999",
    ),
    dict(
        name="filter_not_missing_field",
        why="the compiler's NOT null-collapse (false-on-missing) needs an "
            "inner condition that can BE null; every prior condition "
            "touched a real column (r18 finding: dropping the coalesce "
            "was GREEN) — the gate carries a NOT over 'no_such_field'",
        greps=[
            ("src/main/scala/graft/filter/FilterCompiler.scala",
             "!coalesce(compile(g, resolve), lit(false))"),
            ("src/main/scala/graft/queries/FilterQueries.scala",
             '{"$not": {"no_such_field": {"$gt": 0}}}'),
        ],
    ),
    dict(
        name="branch_diff_same_id_arbitration",
        why="layer precedence (latest change per id wins) is only "
            "observable in diff when one id carries TWO changes whose "
            "winners differ in __op (r18 finding: the disjoint-id fixture "
            "left an inverted window GREEN for branch_diff) — ids 0,1 are "
            "upserted then deleted",
        greps=[
            ("src/main/scala/graft/ops/Branching.scala",
             '.partitionBy(col(idCol)).orderBy(col("__seq").desc)'),
            ("src/main/scala/graft/queries/AdvancedQueries.scala",
             't.delete("exp", Seq("0", "1"))'),
        ],
    ),
    dict(
        name="batch_topk_multipartition_plan",
        why="a single-partition scan collapses the top-k aggregate to one "
            "merge(zero, partial), a plan shape where a k+1 buffer bound "
            "self-repairs (ascending re-insertion rejects the overflow "
            "element) — r18 finding: the TopKAgg buffer mutation was "
            "GREEN until the gate repartitioned its input like real "
            "multi-file scans",
        greps=[
            ("src/main/scala/graft/functions/TopKAgg.scala",
             "val m = math.min(n + 1, k)"),
            ("src/main/scala/graft/queries/VectorQueries.scala",
             ".repartition(s.sparkContext.defaultParallelism)"),
        ],
    ),
    # --- ninth wave (r19): five fixture hardenings, each found by a GREEN
    # (or vacuous) first mutation run and fixed by giving the gate real
    # arbitration pressure.
    dict(
        name="q2_having_cuts_groups",
        why="HAVING > 10 was vacuous at sf0.01 (all five 'O' priority "
            "groups ~1000 rows), so analytics_having_skip was "
            "gate-invisible; the threshold is 1000 and must keep cutting "
            "at least one group",
        greps=[
            ("src/main/scala/graft/queries/AnalyticsQueries.scala",
             "HAVING count(*) > 1000"),
            ("src/main/scala/graft/queries/AnalyticsQueries.scala",
             'having = Some(col("n_orders") > 1000)'),
        ],
        probe="SELECT count(*) FROM (SELECT o_orderpriority FROM orders "
              "WHERE o_orderstatus = 'O' GROUP BY 1 "
              "HAVING count(*) <= 1000)",
    ),
    dict(
        name="needleql_view_refresh_loadbearing",
        why="CREATE MATERIALIZED VIEW materializes at create time, so "
            "refreshing a never-changed base made refreshView dead code "
            "(needleql_view_stale was GREEN); the fixture must create the "
            "view over the NARROW base then widen and refresh — the probe "
            "asserts rows >= 120 exist to widen INTO",
        greps=[
            ("src/main/scala/graft/queries/LanguageSurfaceQueries.scala",
             'ns.register("docsrc", CollectionDef(d.filter(col("doc_id") '
             '< 120),'),
            ("src/main/scala/graft/queries/LanguageSurfaceQueries.scala",
             "// base widens AFTER create; the stale snapshot holds only "
             "100-119"),
        ],
        probe="SELECT count(*) FROM documents "
              "WHERE doc_id BETWEEN 120 AND 160",
    ),
    dict(
        name="cross_collection_lists_overlap",
        why="two different isotropic query vectors gave DISJOINT top-20 "
            "lists, so MinScore's keep-LOWEST rule never arbitrated "
            "(cross_collection_keep_rule was GREEN); the fixture shares "
            "one query across cosine/euclidean and the probe asserts the "
            "two top-20s still overlap",
        greps=[
            ("src/main/scala/graft/queries/AdvancedQueries.scala",
             'Seq("colA" -> top20("cosine"), "colB" -> top20("euclidean"))'),
        ],
        probe="WITH q0 AS (SELECT embedding AS qv FROM embeddings "
              "WHERE vec_id = 0), "
              "a AS (SELECT vec_id AS id FROM embeddings, q0 ORDER BY "
              "round(1 - list_cosine_similarity(embedding::DOUBLE[], "
              "qv::DOUBLE[]), 6), vec_id LIMIT 20), "
              "b AS (SELECT vec_id AS id FROM embeddings, q0 ORDER BY "
              "round(list_distance(embedding::DOUBLE[], qv::DOUBLE[]), 6),"
              " vec_id LIMIT 20) "
              "SELECT count(*) FROM a JOIN b USING (id)",
    ),
    dict(
        name="graphrag_expansion_reachable",
        why="with an arbitrary corpus query vector, isotropic seed "
            "distances capped vector_score at ~0.14 and hop nodes "
            "(<= 0.7*vs + 0.15) could never displace the weakest seed "
            "(0.3) — the expansion loop was gate-dead (graphrag_hop_decay "
            "GREEN); the query must be an entity's own centroid "
            "(vs = 1.0 at the top). Verified after the fix: 9 of 10 "
            "result rows are hop-1 (bench_history/gate_sensitivity_"
            "r19_p5b.json); the greps pin the query construction",
        greps=[
            ("src/main/scala/graft/queries/AdvancedQueries.scala",
             "val q = entVecs.filter(col(\"id\") ==="),
            ("src/main/scala/graft/queries/AdvancedQueries.scala",
             "WHERE entity_id = (SELECT min(entity_id) FROM evec)),"),
        ],
    ),
    dict(
        name="quality_punct_doc",
        why="the word-salad corpus holds ZERO punctuation in doc_id < 100 "
            "(measured r19), so the punct penalty was vacuously 1.0 and "
            "its 2.0 multiplier unobservable; doc 900100 is planted with "
            "a ratio strictly inside (0, 0.5) — live and unsaturated",
        greps=[
            ("src/main/scala/graft/queries/PipelineQueries.scala",
             "'graft quality fixture, with punct; the fox jumps. over!'"),
            ("src/main/scala/graft/queries/PipelineQueries.scala",
             "lit(\"graft quality fixture, with punct; the fox jumps. "
             "over!\")"),
            ("src/main/scala/graft/pipeline/TextAnalysis.scala",
             "val punctScore = lit(1.0) - least(punctRatio(text) * 2.0, "
             "lit(1.0))"),
        ],
        # the planted ratio must stay strictly inside (0, 0.5): penalty
        # live (ratio > 0) and unsaturated under both the real 2.0 and a
        # mutated 2.5 multiplier
        static=lambda: (lambda t: 0.0 <
            sum(1 for ch in t if ch in
                "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~") / len(t) < 0.5)(
            "graft quality fixture, with punct; the fox jumps. over!"),
    ),
]


def main():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    ok = True
    print(f"# boundary_lint over {SF_DIR}")
    print("| check | greps | boundary rows | verdict |")
    print("|---|---|---|---|")
    for c in CHECKS:
        stale = []
        for path, needle in c.get("greps", []):
            full = os.path.join(REPO, path)
            try:
                with open(full) as fh:
                    if needle not in fh.read():
                        stale.append(f"{path}: {needle!r} gone")
            except OSError:
                stale.append(f"{path}: unreadable")
        n = None
        if "probe" in c:
            n = con.execute(c["probe"]).fetchone()[0]
        static_ok = c["static"]() if "static" in c else True
        if stale:
            verdict = "STALE-GREP"
        elif not static_ok:
            verdict = "STATIC-FAIL"
        elif n is not None and c.get("expect_zero"):
            verdict = "OK (still zero)" if n == 0 else \
                f"ADJUDICATION-STALE ({n} rows)"
        elif n is not None:
            verdict = "OK" if n >= 1 else "NO BOUNDARY ROW"
        else:
            verdict = "OK (static)"
        if not verdict.startswith("OK"):
            ok = False
        grep_n = len(c.get("greps", []))
        print(f"| {c['name']} | {grep_n} | "
              f"{'-' if n is None else n} | {verdict} |")
        if stale:
            for s in stale:
                print(f"#   stale: {s}")
    print(f"\n{'ALL GREEN' if ok else 'LINT FAILED'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
