package graft

import org.apache.spark.sql.functions._

import graft.ops.QueryAnalytics

/** Query-analytics dashboard (reference: experimental/analytics.rs). */
class QueryAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (String, String, Double, Long, Option[Int], Boolean, Long, Long)*) =
    rows.toDF("collection", "operation", "latency_ms", "result_count", "k",
      "has_filter", "filter_complexity", "ts")

  test("insights: index percentiles with the degenerate p99 = max quirk") {
    // 10 search events, latencies 1..10 → p50 index 10*50/100 = 5 → 6.0;
    // p95 index 9 → 10.0; p99 = max = 10.0 (analytics.rs:527-536)
    val l = log((1 to 10).map(i =>
      ("c", "search", i.toDouble, 1L, Some(10), false, 0L, 100L + i)): _*)
    val r = QueryAnalytics.insights(l, now = 200L, windowSecs = 200L,
      slowThresholdMs = 8.5).collect().head
    assert(r.getAs[Double]("p50_latency_ms") == 6.0)
    assert(r.getAs[Double]("p95_latency_ms") == 10.0)
    assert(r.getAs[Double]("p99_latency_ms") == 10.0)
    assert(r.getAs[Double]("avg_latency_ms") == 5.5)
    assert(r.getAs[Long]("slow_query_count") == 2) // 9, 10
    assert(r.getAs[Double]("current_qps") == 10.0 / 200.0)
  }

  test("insights: empty window and non-search ops produce zeros, not nulls") {
    val l = log(("c", "insert", 5.0, 0L, None, false, 0L, 10L))
    val r = QueryAnalytics.insights(l, now = 500L, windowSecs = 100L,
      slowThresholdMs = 1.0).collect().head
    assert(r.getAs[Double]("avg_latency_ms") == 0.0 &&
      r.getAs[Double]("p99_latency_ms") == 0.0 &&
      r.getAs[Double]("filtered_query_ratio") == 0.0)
  }

  test("slowQueries attaches the reference's suggestions") {
    val l = log(
      ("c", "search", 200.0, 1L, Some(500), true, 9L, 1L),  // both suggestions
      ("c", "search", 150.0, 1L, Some(10), false, 0L, 2L),  // none
      ("c", "search", 50.0, 1L, Some(10), false, 0L, 3L))   // under threshold
    val rows = QueryAnalytics.slowQueries(l, thresholdMs = 100.0, limit = 10)
      .select("latency_ms", "suggestions").collect()
    assert(rows.length == 2)
    val byLat = rows.map(r => r.getDouble(0) -> r.getSeq[String](1)).toMap
    assert(byLat(200.0).length == 2 &&
      byLat(200.0).exists(_.contains("simplifying the filter")) &&
      byLat(200.0).exists(_.contains("pagination")))
    assert(byLat(150.0).isEmpty)
  }

  test("patterns key on (collection, operation, filter, k); top/slowest order") {
    val l = log(
      (Seq.fill(5)(("a", "search", 10.0, 1L, Some(10), false, 0L, 1L)) ++
        Seq.fill(3)(("a", "search", 99.0, 1L, Some(50), false, 0L, 2L)) ++
        Seq(("b", "query", 1.0, 1L, None, true, 0L, 3L))): _*)
    val p = QueryAnalytics.patterns(l).collect()
    assert(p.length == 3, "three distinct pattern keys")
    val top = QueryAnalytics.topPatterns(l, 1).collect().head
    assert(top.getAs[Long]("count") == 5 && top.getAs[Int]("typical_k") == 10)
    val slowest = QueryAnalytics.slowestPatterns(l, 1).collect().head
    assert(slowest.getAs[Double]("p99_latency_ms") == 99.0)
    // null k defaults typical_k to 10 (analytics.rs:215)
    assert(p.find(_.getAs[String]("collection") == "b")
      .get.getAs[Int]("typical_k") == 10)
  }

  test("collectionAnalytics splits op classes per collection") {
    val l = log(
      ("a", "search", 10.0, 1L, None, false, 0L, 1L),
      ("a", "upsert", 30.0, 0L, None, false, 0L, 2L),
      ("a", "delete", 1.0, 0L, None, false, 0L, 3L),
      ("b", "query", 7.0, 1L, None, false, 0L, 4L))
    val m = QueryAnalytics.collectionAnalytics(l).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("a").getAs[Long]("total_queries") == 1 &&
      m("a").getAs[Long]("total_inserts") == 1 &&
      m("a").getAs[Long]("total_deletes") == 1)
    assert(m("a").getAs[Double]("avg_insert_latency_ms") == 30.0)
    assert(m("b").getAs[Double]("avg_search_latency_ms") == 7.0 &&
      m("b").getAs[Double]("avg_insert_latency_ms") == 0.0)
  }
}
