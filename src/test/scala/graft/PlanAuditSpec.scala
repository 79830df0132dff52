package graft

/** Physical-plan audit over the declared driver queries (SURVEY §4): the
  * scale-critical family — dedup, blocked graph build, branching, ANN,
  * text indexes — must never plan a CartesianProduct, and the blocked/
  * banded operators must not fall back to BroadcastNestedLoopJoin either.
  * (Some queries legitimately nested-loop a 1-row broadcast query-vector
  * frame or run a documented exact-oracle self-join — those are excluded
  * by name, not waved through silently.)
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // equi-join-only operators: neither cartesian nor nested-loop allowed
  private val strictQueries = Seq(
    "graph_knn_edges", "ngram_jaccard", "dedup_exact",
    "branch_resolve", "branch_diff", "chunk_fixed", "pipeline_ingest",
    "q4_join_topk", "debezium_parse", "event_replay",
    // round-4 surfaces: federated merge, bandits, temporal sequences,
    // relevance feedback, agent memory, knowledge graph, CRDT
    "federated_rrf", "federated_consensus", "bandit_rerank",
    "seq_drift", "seq_trend", "trajectory_centroid", "trajectory_dtw",
    "feedback_adjust", "ab_report", "memory_recall",
    "memory_context_recall", "memory_consolidate", "kg_search",
    "kg_context_search", "crdt_converge", "crdt_merkle_diff",
    "hooked_pipeline", "query_patterns",
    "collection_analytics", "drift_dimensions", "drift_report",
    // round-5 surfaces: deterministic corpus plumbing + dedup groups —
    // all equi-join/aggregation shapes
    "split_assign", "sample_hash", "stratified_sample", "training_shuffle",
    "pack_sequential", "repetition_signals", "contamination_ngram",
    "pipeline_train_prep", "dedup_groups",
    // round-6 surfaces: span dedup is a min-struct aggregate keyed by the
    // span value plus an equi-join back; gopher/pii are narrow per-row passes
    "span_dedup", "gopher_rules", "pii_scrub",
    // round-5: the oracle conversions dropped their 1-row broadcast
    // planted-check frames, so banding/chunk joins audit strictly
    "minhash_lsh_dedup", "simhash_near_dup",
    // round-5 language-surface gates: parser/session/DSL compile down to
    // scans + windows + equi-joins
    "needleql_nearest", "needleql_asof", "alias_query", "needleql_view",
    "windowed_agg", "bundle_roundtrip", "bm25_incremental", "pipeline_dsl",
    // round-6 continuation: stored/pinned IVF probes are filter+top-k
    // scans, the interchange fingerprint is union+aggregate, and the
    // fusion fold emits a driver-local frame
    "ivf_pruned_fixed", "ivf_stored_search", "export_import_all",
    "adaptive_fusion",
    // round-9 enterprise gates: tenant usage/gdpr are grouped
    // aggregations, blocked LOF is equi-joins over shared-cell candidates
    "tenant_usage", "gdpr_delete", "lof_blocked_full_probe",
    // round-10 governance/IDE/RAG gates: RBAC is a pushed predicate over
    // one scan, schema validation/defaults/chunking are narrow exploded
    // passes, the metadata diff is one full-outer equi-join, and the
    // transactional commit is an anti-join ∪ literal rows
    "rbac_read", "schema_validate", "schema_defaults",
    "schema_index_stats", "code_chunk_flat", "code_metadata_diff",
    "rag_chunks", "txn_commit",
    // round-11: the recovered-state projection reads the snapshot
    // parquet back through one scan + project + sort
    "pitr_roundtrip",
    // round-12: the pinned query-builder twin is a driver-local literal
    // frame + sort — no joins by construction
    "query_builder_fixed")

  // allowed a bounded broadcast nested loop — a 1-ROW broadcast frame
  // (BM25's (n, avgdl) corpus stats, the dedup gates' planted-pair count,
  // query-vector frames) or a k-bounded candidate broadcast — but never a
  // cartesian of two scans
  private val noCartesianQueries = Seq(
    "bm25_search",
    "hybrid_rrf", "ivf_knn_full_probe", "ivf_knn_pruned", "vec_cluster",
    "crossmodal_rrf", "ensemble_rerank", "batch_knn_cosine",
    "cf_recommend", "field_stats", "needleql_rerank_field",
    // two 1-row aggregate frames cross-joined into the report row
    "query_insights",
    // broadcast query-vector frame feeding the bounded top-k aggregate
    "batch_knn_bulk",
    // 1-row broadcast corpus-total frame for the token-share column
    "corpus_mix_report",
    // 1-row broadcast query-vector frames (round-9 enterprise gates)
    "acl_search", "dp_search", "dp_search_gaussian",
    // 1-row broadcast per-language totals frame (round-10)
    "code_index_status")

  for (name <- strictQueries)
    test(s"$name plans no cartesian and no nested-loop join") {
      val plan = SparkEntry.all(name).fn(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name: $plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name: $plan")
    }

  for (name <- noCartesianQueries)
    test(s"$name plans no cartesian product") {
      val plan = SparkEntry.all(name).fn(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name: $plan")
    }

  test("q5_region_revenue: every dimension broadcasts, p_size pushes to the scan") {
    val plan = SparkEntry.all("q5_region_revenue").fn(spark, dir)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4, s"expected 4 broadcast joins, got $broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact table must not sort-merge:\n$plan")
    assert(plan.contains("LessThanOrEqual(p_size,25)"),
      s"p_size filter not pushed to the parquet scan:\n$plan")
  }

  // dedup_insert_reject's gate runs at correctness scale where the exact
  // |incoming|×|coll| form is definitional — so the AUDITED shape is the
  // one a big collection takes: above maxExactRows the 1-NN must plan as
  // an IVF cell equi-join, never a cartesian or nested loop
  test("dedupInsert blocked path plans an equi-join, no cartesian/BNLJ") {
    import org.apache.spark.sql.functions._
    val vec = array((col("id") % 5 + 1).cast("float"),
      (col("id") % 3 + 1).cast("float"), lit(1f))
    val coll = spark.range(500).select(col("id"), vec.as("vector"),
      lit("{}").as("metadata"))
    val incoming = spark.range(3).select((col("id") + 1000).as("id"),
      vec.as("vector"), lit("{}").as("metadata"))
    val got = graft.ops.Mutations.dedupInsert(coll, incoming, 0.0001,
      graft.ops.Mutations.DedupPolicy.Reject,
      maxExactRows = 0, numCells = 4, nprobe = 2)
    for (df <- Seq(got.outcomes, got.collection)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  // narrow per-row operators: the ONLY exchange allowed is the gate's
  // final ORDER BY (range partitioning) — a hash repartition anywhere
  // means the "streams at scan speed" claim is false
  for (name <- Seq("gopher_rules", "pii_scrub", "c4_rules"))
    test(s"$name shuffles only for its final sort") {
      val plan = SparkEntry.all(name).fn(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning"), s"$name: $plan")
    }

  // the "k-bounded candidate list" contracts on the unpartitioned-ranking
  // fusion sites are executable: a frame Catalyst statically knows to
  // exceed the global-window bound is rejected at plan time (zero runtime
  // cost); the engine's own limit-terminated shapes pass
  test("k-bounded guards: statically oversized candidate frames rejected " +
      "at Rrf.fuse / ensembleRerank / CrossCollection.merge; " +
      "limit-bounded shapes pass") {
    import org.apache.spark.sql.functions._
    import graft.internal.Guards
    val big = spark.range(Guards.MaxGlobalWindowRows + 1).select(
      col("id").cast("string").as("id"),
      col("id").cast("double").as("distance"),
      col("id").cast("double").as("score"))
    // the mechanism itself: Catalyst statically bounds range→project
    assert(big.queryExecution.analyzed.maxRows
      .contains(Guards.MaxGlobalWindowRows + 1))
    intercept[IllegalArgumentException](graft.text.Rrf.fuse(big, big.limit(10)))
    intercept[IllegalArgumentException](graft.text.Rrf.fuse(big.limit(10), big))
    intercept[IllegalArgumentException](
      graft.ops.Extras.ensembleRerank(Seq((big, 1.0)), 5))
    intercept[IllegalArgumentException](
      graft.ops.CrossCollection.merge(Seq("a" -> big), 5))
    // limit-terminated candidate lists — the engine's own call shape
    val fused = graft.text.Rrf.fuse(
      big.limit(100).select("id", "distance"),
      big.limit(100).select("id", "score"))
    assert(fused.columns.contains("rrf_score"))
    assert(fused.count() == 10)
  }

  // CrossModal's per-modality window rides post-limit frames by
  // construction: the fused result of a search over an unbounded-size
  // modality table is STATICALLY bounded by lists × perModalityK, and the
  // per-modality top-k plans as TakeOrderedAndProject, not a global sort
  test("crossModal search output is statically k-bounded; per-modality " +
      "top-k is TakeOrderedAndProject") {
    import org.apache.spark.sql.functions._
    val table = spark.range(100000).select(
      col("id").cast("string").as("id"),
      array((col("id") % 7 + 1).cast("float"),
        (col("id") % 5 + 1).cast("float")).as("vector"))
    val eng = new graft.ops.CrossModal.Engine(
      Seq(graft.ops.CrossModal.Modality("text", table, 2),
        graft.ops.CrossModal.Modality("image", table, 2)),
      perModalityK = 10)
    val res = eng.search(spark, Array(1f, 2f), Seq("text", "image"), k = 5)
    assert(res.queryExecution.analyzed.maxRows.exists(_ <= 20L),
      s"fused frame must be statically bounded: " +
        s"${res.queryExecution.analyzed.maxRows}")
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
