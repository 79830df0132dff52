package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-analytics dashboard (reference: src/experimental/analytics.rs) —
  * insights, slow-query log, query-pattern analysis, and per-collection
  * stats over a query-event log.
  *
  * Spark re-expression: the reference is an in-process ring of recent
  * events plus atomic counters; here the event log IS a DataFrame
  * (collection, operation, latency_ms, result_count, k, has_filter,
  * filter_complexity, ts) and every dashboard read is one aggregation.
  * `now` is an explicit parameter (the reference reads Instant::now()).
  *
  * Reference quirks kept:
  *   - percentiles are the value at 0-based index len·p/100 of the sorted
  *     latencies (analytics.rs:527-536) — NOT interpolated; the p99 index
  *     expression `max(len-1, len·99/100)` always evaluates to len-1, so
  *     p99 IS the maximum. Both reproduced exactly.
  *   - a pattern is keyed by (collection, operation, has_filter, k)
  *     (compute_pattern_id, :227-235); `typical_k` = k (constant within a
  *     pattern) defaulting to 10; percentiles use the LAST 1000 events of
  *     the pattern (:478-482) while count/averages cover all.
  *   - slow-query suggestions (:389-412): complex filter (> 5 conditions)
  *     and high k (> 100).
  *
  * Scale: counters shuffle on (collection[, operation, has_filter, k]) —
  * bounded keys. Percentile ranks (the reference's sorted-ring reads) are
  * computed by [[rankedByRange]]: range-partition on the sort key, local
  * rank, driver-side partition-prefix shift — never a
  * `Window.partitionBy(lit(1))` single-partition sort, and a skewed
  * pattern key splits across partitions instead of serializing on one.
  */
object QueryAnalytics {

  private val searchOps = Seq("search", "query")

  /** Order-independent mean of a latency column known to carry exactly 3
    * decimal places (the log stores ms at µs-truncated 3-decimal precision,
    * analytics.rs:429-456): sum as fixed-point longs — associative and
    * commutative, so Spark's partial-aggregate merge order cannot move the
    * 6th decimal — then divide once. A plain `avg()` over thousands of f64
    * values differs from a sequential engine's sum in the last ulps.
    */
  private def avgFixed3(c: Column): Column =
    sum(round(c * 1000, 0).cast("long")).cast("double") / (count(c) * 1000.0)

  /** 0-based reference percentile index over an ordered-by-latency window
    * partitioned by the pattern key: picks latency at rank len·p/100.
    */
  private def pct(latCol: String, rnk0: Column, n: Column, p: Int): Column =
    max(when(rnk0 === floor(n * p / 100), col(latCol)))

  /** Delegates to [[DistributedRank.rankedByRange]] — exact per-group
    * 0-based rank via range partitioning + driver-side prefix counts,
    * never a `Window.partitionBy(lit(1))` single-partition sort. The
    * reference computes the same rank by sorting its in-memory ring.
    */
  private def rankedByRange(df: DataFrame, keys: Seq[String],
                            order: Seq[Column], rankCol: String, nCol: String,
                            numPartitions: Int)
      : (DataFrame, () => Unit) =
    DistributedRank.rankedByRange(df, keys, order, rankCol, nCol,
      numPartitions)

  /** One-row dashboard insights (analytics.rs:506-577) over the events
    * with `ts` in (now − windowSecs, now].
    */
  def insights(log: DataFrame, now: Long, windowSecs: Long,
               slowThresholdMs: Double, rankPartitions: Int = 32): DataFrame = {
    val inWindow = log.filter(col("ts") > now - windowSecs && col("ts") <= now)
    val (search, cleanup) = rankedByRange(
      inWindow.filter(col("operation").isin(searchOps: _*)),
      keys = Nil, order = Seq(col("latency_ms").asc, col("ts").asc),
      rankCol = "__r", nCol = "__n", numPartitions = rankPartitions)
    val lat = search.agg(
      coalesce(avgFixed3(col("latency_ms")), lit(0.0)).as("avg_latency_ms"),
      coalesce(pct("latency_ms", col("__r"), col("__n"), 50), lit(0.0))
        .as("p50_latency_ms"),
      coalesce(pct("latency_ms", col("__r"), col("__n"), 95), lit(0.0))
        .as("p95_latency_ms"),
      // p99 index = max(len-1, len·99/100) = len-1 → the maximum
      coalesce(max(col("latency_ms")), lit(0.0)).as("p99_latency_ms"))
    val counters = inWindow.agg(
      (count(lit(1)).cast("double") / windowSecs).as("current_qps"),
      sum(when(col("operation").isin(searchOps: _*), 1L).otherwise(0L))
        .as("total_queries"),
      sum(when(col("operation").isin("insert", "upsert"), 1L).otherwise(0L))
        .as("total_inserts"),
      sum(when(col("operation") === "delete", 1L).otherwise(0L))
        .as("total_deletes"),
      sum(when(col("operation").isin(searchOps: _*) &&
        col("latency_ms") > slowThresholdMs, 1L).otherwise(0L))
        .as("slow_query_count"),
      coalesce(
        sum(when(col("operation").isin(searchOps: _*) && col("has_filter"), 1L)
          .otherwise(0L)).cast("double") /
          nullif(sum(when(col("operation").isin(searchOps: _*), 1L)
            .otherwise(0L)), lit(0L)),
        lit(0.0)).as("filtered_query_ratio"))
    // one row: materialize eagerly so the ranked input can be unpersisted
    try counters.crossJoin(lat).localCheckpoint(true)
    finally cleanup() // released on the checkpoint-failure path too
  }

  /** Slow-query log (analytics.rs:389-412, 580-589): events over the
    * threshold, most recent first, with the reference's reasons and
    * optimization suggestions.
    */
  def slowQueries(log: DataFrame, thresholdMs: Double, limit: Int): DataFrame =
    log.filter(col("operation").isin(searchOps: _*) &&
        col("latency_ms") > thresholdMs)
      .withColumn("reason",
        concat(lit("Latency "), col("latency_ms"), lit("ms exceeds threshold "),
          lit(thresholdMs), lit("ms")))
      .withColumn("suggestions", array_compact(array(
        when(col("has_filter") &&
          coalesce(col("filter_complexity"), lit(0)) > 5,
          "Consider simplifying the filter or creating a specialized index"),
        when(coalesce(col("k"), lit(0)) > 100,
          "High k value increases search time - consider pagination"))))
      .orderBy(col("ts").desc, col("latency_ms").desc)
      .limit(limit)

  /** Query patterns (analytics.rs:208-256): keyed by (collection,
    * operation, has_filter, k); count/avg over every event, percentiles
    * over each pattern's most recent 1000.
    */
  def patterns(log: DataFrame, rankPartitions: Int = 32): DataFrame = {
    val keyNames = Seq("collection", "operation", "has_filter", "k")
    val key = keyNames.map(col)
    // recency rank per pattern: distributed exact rank — a pattern that
    // dominates the log no longer serializes its rows on one partition
    val (withRec, cleanRec) = rankedByRange(log, keyNames,
      order = Seq(col("ts").desc), rankCol = "__rec0", nCol = "__ntot",
      numPartitions = rankPartitions)
    try {
      val recent1000 = col("__recency") <= 1000
      // recent-window size is min(total, 1000) by construction — no second
      // per-key pass needed
      val (ranked, cleanRnk) = rankedByRange(
        withRec.withColumn("__recency", col("__rec0") + 1)
          .withColumn("__n", least(col("__ntot"), lit(1000L))),
        keyNames,
        order = Seq(when(recent1000, 0).otherwise(1).asc,
          col("latency_ms").asc, col("ts").asc),
        rankCol = "__r", nCol = "__ntot2", numPartitions = rankPartitions)
      try ranked.groupBy(key: _*)
        .agg(
          count(lit(1)).as("count"),
          avgFixed3(col("latency_ms")).as("avg_latency_ms"),
          pct("latency_ms", col("__r"), col("__n"), 50).as("p50_latency_ms"),
          pct("latency_ms", col("__r"), col("__n"), 95).as("p95_latency_ms"),
          max(when(recent1000, col("latency_ms"))).as("p99_latency_ms"),
          avg(col("result_count")).as("avg_result_count"),
          min(col("ts")).as("first_seen"), max(col("ts")).as("last_seen"))
        .withColumn("typical_k", coalesce(col("k"), lit(10)))
        .withColumn("uses_filter", col("has_filter"))
        .drop("has_filter", "k")
        // ≤ |patterns| rows: materialize, then release the ranked inputs
        .localCheckpoint(true)
      finally cleanRnk()
    } finally cleanRec() // both pins released on every failure path
  }

  def topPatterns(log: DataFrame, limit: Int): DataFrame =
    patterns(log).orderBy(col("count").desc, col("collection").asc,
      col("operation").asc, col("typical_k").asc_nulls_last).limit(limit)

  def slowestPatterns(log: DataFrame, limit: Int): DataFrame =
    patterns(log).orderBy(col("p99_latency_ms").desc, col("collection").asc,
      col("operation").asc, col("typical_k").asc_nulls_last).limit(limit)

  /** Per-collection analytics (analytics.rs:429-456): op-class totals +
    * average search/insert latency (the reference's running average equals
    * the plain mean; computed fixed-point here, see [[avgFixed3]]).
    */
  def collectionAnalytics(log: DataFrame): DataFrame =
    log.groupBy(col("collection"))
      .agg(
        sum(when(col("operation").isin(searchOps: _*), 1L).otherwise(0L))
          .as("total_queries"),
        sum(when(col("operation").isin("insert", "upsert"), 1L).otherwise(0L))
          .as("total_inserts"),
        sum(when(col("operation") === "delete", 1L).otherwise(0L))
          .as("total_deletes"),
        coalesce(avgFixed3(when(col("operation").isin(searchOps: _*),
          col("latency_ms"))), lit(0.0)).as("avg_search_latency_ms"),
        coalesce(avgFixed3(when(col("operation").isin("insert", "upsert"),
          col("latency_ms"))), lit(0.0)).as("avg_insert_latency_ms"))
}
