package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query replay & regression testing (reference: src/services/search/
  * query_replay.rs): production queries are recorded with their result
  * id lists and latencies, replayed against a new configuration, and the
  * two runs diff into per-query recall / latency-change rows plus a
  * pass-fail report — recall regression gating before a deploy.
  *
  * Spark shape: both runs are ordinary frames
  * `(query_idx long, ids array<string>, latency_ms double)` — one row
  * per recorded query (a recorder is just `collect_list` over whatever
  * search produced the run). The diff is ONE equi-join on query_idx with
  * expression-level set arithmetic (`array_intersect`/`array_except` on
  * deduplicated ids), and the report is one aggregation over it — two
  * shuffle-free-at-scale grouped passes, no driver loops, 100 TB-safe
  * because everything keys on query_idx.
  *
  * Determinism note: the reference emits missing/new ids in HashSet
  * iteration order (query_replay.rs:264-271) — here they are sorted
  * ascending.
  */
object QueryReplay {

  /** Per-query diff rows (query_replay.rs:241-293). Queries without a
    * replayed counterpart are skipped, like the reference's `None`
    * results. Recall is SET overlap over the original ids (empty
    * original → 1.0); latency change is percent vs the original (0 when
    * the original latency is not positive).
    */
  def details(original: DataFrame, replayed: DataFrame): DataFrame = {
    val o = original.select(col("query_idx"),
      array_distinct(col("ids")).as("__oids"),
      col("latency_ms").as("original_latency_ms"))
    val n = replayed.select(col("query_idx"),
      array_distinct(col("ids")).as("__nids"),
      col("latency_ms").as("new_latency_ms"))
    o.join(n, "query_idx")
      .withColumn("recall",
        when(size(col("__oids")) === 0, lit(1.0))
          .otherwise(size(array_intersect(col("__oids"), col("__nids")))
            .cast("double") / size(col("__oids"))))
      .withColumn("latency_change_pct",
        when(col("original_latency_ms") > 0,
          (col("new_latency_ms") - col("original_latency_ms")) /
            col("original_latency_ms") * 100.0)
          .otherwise(lit(0.0)))
      .withColumn("missing_ids",
        array_sort(array_except(col("__oids"), col("__nids"))))
      .withColumn("new_ids",
        array_sort(array_except(col("__nids"), col("__oids"))))
      .drop("__oids", "__nids")
  }

  /** One-row summary (query_replay.rs:295-308): averages over the
    * replayed queries, min recall (1.0 when nothing replayed), regression
    * count below `threshold`, and the overall pass flag.
    */
  def report(original: DataFrame, replayed: DataFrame,
             threshold: Double = 0.8): DataFrame =
    details(original, replayed).agg(
      count(lit(1)).as("total_queries"),
      coalesce(avg(col("recall")), lit(1.0)).as("avg_recall"),
      coalesce(min(col("recall")), lit(1.0)).as("min_recall"),
      coalesce(avg(col("latency_change_pct")), lit(0.0))
        .as("avg_latency_change_pct"),
      count(when(col("recall") < threshold, 1)).as("regressions"))
    .withColumn("regression_threshold", lit(threshold))
    .withColumn("passed", col("regressions") === 0)
}
