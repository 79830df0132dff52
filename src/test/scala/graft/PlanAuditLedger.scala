package graft

/** Shared name ledger for the physical-plan audits: [[PlanAuditSpec]]
  * asserts per-name invariants for these queries; [[PlanSweepSpec]]
  * audits the complement (every declared driver query NOT named here),
  * so between the two specs, plan-audit coverage of `SparkEntry.all` is
  * total by construction — a new query is swept cartesian-free by
  * default until it is adjudicated into one of these lists.
  */
object PlanAuditLedger {

  /** equi-join-only operators: neither cartesian nor nested-loop allowed */
  val strictQueries: Seq[String] = Seq(
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

  /** allowed a bounded broadcast nested loop — a 1-ROW broadcast frame
    * (BM25's (n, avgdl) corpus stats, the dedup gates' planted-pair count,
    * query-vector frames) or a k-bounded candidate broadcast — but never a
    * cartesian of two scans
    */
  val noCartesianQueries: Seq[String] = Seq(
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

  /** queries with a bespoke named test in PlanAuditSpec (shape-specific
    * invariants beyond cartesian-freedom), already counted above or
    * audited on a purpose-built frame
    */
  val bespokeQueries: Seq[String] = Seq(
    "q5_region_revenue", "c4_rules")

  /** every name with a per-name audit — [[PlanSweepSpec]] sweeps the rest */
  val named: Set[String] =
    (strictQueries ++ noCartesianQueries ++ bespokeQueries).toSet
}
