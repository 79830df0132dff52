package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.QueryAnalytics

/** Oracle gates for the query-analytics dashboard (reference:
  * src/experimental/analytics.rs). The query log derives from `events`:
  * operation classes cycle with event_id (6 search : 1 query : 1 insert :
  * 1 upsert : 1 delete), latency is synthesized from pure integer
  * arithmetic on event_id, and timestamps are synthetic epoch seconds so
  * the rate window is deterministic.
  */
object AnalyticsDashQueries {

  private val qlogCte =
    """qlog AS (
      |  SELECT event_type AS collection,
      |         CASE event_id % 10 WHEN 7 THEN 'insert' WHEN 8 THEN 'upsert'
      |              WHEN 9 THEN 'delete' WHEN 6 THEN 'query'
      |              ELSE 'search' END AS operation,
      |         CAST((event_id * 7919) % 100000 AS BIGINT) AS lat_micro,
      |         CAST((event_id * 7919) % 100000 AS BIGINT) / 1000.0 AS latency_ms,
      |         CAST(event_id % 20 AS BIGINT) AS result_count,
      |         CASE event_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 50 END AS k,
      |         event_id % 2 = 0 AS has_filter,
      |         CAST(CASE WHEN event_id % 5 = 0 THEN 8 ELSE 2 END AS BIGINT) AS filter_complexity,
      |         1700000000 + event_id % 5000 AS ts
      |  FROM events WHERE event_id < 6000
      |)""".stripMargin

  private def qlog(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events").filter(col("event_id") < 6000).select(
      col("event_type").as("collection"),
      when(col("event_id") % 10 === 7, "insert")
        .when(col("event_id") % 10 === 8, "upsert")
        .when(col("event_id") % 10 === 9, "delete")
        .when(col("event_id") % 10 === 6, "query")
        .otherwise("search").as("operation"),
      // latency is synthesized with pure integer arithmetic — no double
      // enters the derivation, so there is no rounding semantics to agree
      // on: (event_id·7919) mod 100000 is identical in any engine, and the
      // IEEE division of that integer by 1000.0 is correctly rounded in
      // both, so latency_ms is bit-identical to the oracle's. (The earlier
      // round(value·10000) derivation tripped on half-tie semantics that
      // differ across DuckDB builds.)
      ((col("event_id") * 7919) % 100000).cast("long").as("lat_micro"),
      (((col("event_id") * 7919) % 100000).cast("long") / lit(1000.0))
        .as("latency_ms"),
      (col("event_id") % 20).as("result_count"),
      when(col("event_id") % 3 === 0, 10)
        .when(col("event_id") % 3 === 1, 50).as("k"),
      (col("event_id") % 2 === 0).as("has_filter"),
      when(col("event_id") % 5 === 0, 8L).otherwise(2L)
        .as("filter_complexity"),
      (lit(1700000000L) + col("event_id") % 5000).as("ts"))

  val defs: Map[String, Q] = Map(
    // Query replay & regression diff (services/search/query_replay.rs):
    // two deterministic "runs" derive from embeddings — per query_idx
    // (vec_id mod 10), the original run's ids are the 5 smallest vec_ids
    // and the replayed run's are ranks 3..7 (partial overlap by
    // construction); latencies are 1+q vs (1+q)·1.5 (an exact 50%
    // change). The oracle replays the set arithmetic with anti-join CTEs
    // and string_agg in the same ascending order the operator sorts its
    // missing/new arrays. All latency literals cast ::DOUBLE (DuckDB
    // decimals would otherwise change the dtype and the arithmetic).
    "query_replay" -> Q(
      """WITH r AS (
        |  SELECT vec_id % 10 AS q, vec_id,
        |         row_number() OVER (PARTITION BY vec_id % 10
        |            ORDER BY vec_id) AS rn
        |  FROM embeddings),
        |o AS (SELECT q, CAST(vec_id AS VARCHAR) AS id FROM r WHERE rn <= 5),
        |nn AS (SELECT q, CAST(vec_id AS VARCHAR) AS id FROM r
        |       WHERE rn BETWEEN 3 AND 7),
        |osz AS (SELECT q, count(*) AS n FROM o GROUP BY q),
        |ov AS (SELECT o.q, count(nn.id) AS c
        |       FROM o LEFT JOIN nn ON o.q = nn.q AND o.id = nn.id
        |       GROUP BY o.q),
        |missrows AS (SELECT q, id FROM o WHERE NOT EXISTS
        |  (SELECT 1 FROM nn WHERE nn.q = o.q AND nn.id = o.id)),
        |miss AS (SELECT q, string_agg(id, '/' ORDER BY id) AS m
        |         FROM missrows GROUP BY q),
        |newrows AS (SELECT q, id FROM nn WHERE NOT EXISTS
        |  (SELECT 1 FROM o WHERE o.q = nn.q AND o.id = nn.id)),
        |nw AS (SELECT q, string_agg(id, '/' ORDER BY id) AS m
        |       FROM newrows GROUP BY q)
        |SELECT osz.q AS query_idx,
        |       round(ov.c::DOUBLE / osz.n, 6) AS recall,
        |       (1.0::DOUBLE + osz.q) AS original_latency_ms,
        |       (1.0::DOUBLE + osz.q) * 1.5::DOUBLE AS new_latency_ms,
        |       round(((1.0::DOUBLE + osz.q) * 1.5::DOUBLE
        |              - (1.0::DOUBLE + osz.q))
        |             / (1.0::DOUBLE + osz.q) * 100.0::DOUBLE, 6)
        |         AS latency_change_pct,
        |       coalesce(miss.m, '') AS missing_ids,
        |       coalesce(nw.m, '') AS new_ids
        |FROM osz JOIN ov ON osz.q = ov.q
        |LEFT JOIN miss ON osz.q = miss.q
        |LEFT JOIN nw ON osz.q = nw.q
        |ORDER BY query_idx""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ranked = Tables.load(s, dir, "embeddings")
        .select((col("vec_id") % 10).as("query_idx"),
          col("vec_id").cast("string").as("id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("query_idx")).orderBy(col("id").cast("long"))))
      def run(cond: org.apache.spark.sql.Column, lat: org.apache.spark.sql.Column) =
        ranked.filter(cond).groupBy("query_idx")
          .agg(sort_array(collect_list(col("id"))).as("ids"))
          .withColumn("latency_ms", lat)
      val original = run(col("rn") <= 5, lit(1.0) + col("query_idx"))
      val replayed = run(col("rn").between(3, 7),
        (lit(1.0) + col("query_idx")) * 1.5)
      graft.ops.QueryReplay.details(original, replayed)
        .select(col("query_idx"), round(col("recall"), 6).as("recall"),
          col("original_latency_ms"), col("new_latency_ms"),
          round(col("latency_change_pct"), 6).as("latency_change_pct"),
          array_join(col("missing_ids"), "/").as("missing_ids"),
          array_join(col("new_ids"), "/").as("new_ids"))
        .orderBy(col("query_idx"))
    },

    // Dashboard insights (analytics.rs:506-577): QPS over the rate
    // window, index-based latency percentiles (p99 = max, the reference's
    // degenerate index expression), op-class totals, slow count, filtered
    // ratio. The hashed surface is all-BIGINT fixed point: rounded DOUBLE
    // quotients proved environment-sensitive across DuckDB builds (last-ulp
    // flips in round(sum/n, 6)), so the gate hashes the micro-unit sums,
    // counts, and micro-unit percentile values instead; ratios (QPS,
    // filtered ratio, averages) are recovered on the Spark side by the
    // exact inverse transform round(q·n) — IEEE division is correctly
    // rounded, so multiplying back by the known denominator recovers the
    // integer numerator exactly. Every oracle-side sum() is additionally
    // CAST to BIGINT: DuckDB types sum(INTEGER) as HUGEINT (INT128), and
    // the verify harness hashes HUGEINT differently from the BIGINT Spark
    // emits even when every value is equal — the r9 root cause of six
    // rounds of value-identical hash mismatches on exactly the two gates
    // whose oracles produced HUGEINT columns.
    "query_insights" -> Q(
      s"""WITH $qlogCte,
        |w AS (SELECT * FROM qlog WHERE ts > 1700000000 AND ts <= 1700005000),
        |s AS (
        |  SELECT lat_micro,
        |         row_number() OVER (ORDER BY lat_micro, ts) - 1 AS r,
        |         count(*) OVER () AS n
        |  FROM w WHERE operation IN ('search', 'query')
        |),
        |lat AS (
        |  SELECT CAST(coalesce(sum(lat_micro), 0) AS BIGINT) AS lat_sum_micro,
        |         count(lat_micro) AS lat_n,
        |         coalesce(max(CASE WHEN r = n * 50 // 100 THEN lat_micro END), 0) AS p50_micro,
        |         coalesce(max(CASE WHEN r = n * 95 // 100 THEN lat_micro END), 0) AS p95_micro,
        |         coalesce(max(lat_micro), 0) AS p99_micro
        |  FROM s
        |),
        |c AS (
        |  SELECT count(*) AS total_ops,
        |         CAST(sum(CASE WHEN operation IN ('search', 'query') THEN 1 ELSE 0 END) AS BIGINT) AS total_queries,
        |         CAST(sum(CASE WHEN operation IN ('insert', 'upsert') THEN 1 ELSE 0 END) AS BIGINT) AS total_inserts,
        |         CAST(sum(CASE WHEN operation = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS total_deletes,
        |         CAST(sum(CASE WHEN operation IN ('search', 'query') AND lat_micro > 90000 THEN 1 ELSE 0 END) AS BIGINT) AS slow_query_count,
        |         CAST(sum(CASE WHEN operation IN ('search', 'query') AND has_filter THEN 1 ELSE 0 END) AS BIGINT) AS filtered_count
        |  FROM w
        |)
        |SELECT * FROM c CROSS JOIN lat""".stripMargin
    ) { (s, dir) =>
      QueryAnalytics.insights(qlog(s, dir), now = 1700005000L,
          windowSecs = 5000L, slowThresholdMs = 90.0)
        .select(
          round(col("current_qps") * 5000).cast("long").as("total_ops"),
          col("total_queries"), col("total_inserts"), col("total_deletes"),
          col("slow_query_count"),
          round(col("filtered_query_ratio") * col("total_queries"))
            .cast("long").as("filtered_count"),
          round(col("avg_latency_ms") * col("total_queries") * 1000)
            .cast("long").as("lat_sum_micro"),
          col("total_queries").as("lat_n"),
          round(col("p50_latency_ms") * 1000).cast("long").as("p50_micro"),
          round(col("p95_latency_ms") * 1000).cast("long").as("p95_micro"),
          round(col("p99_latency_ms") * 1000).cast("long").as("p99_micro"))
    },

    // Query patterns (analytics.rs:208-256) keyed by (collection,
    // operation, has_filter, k) — top 15 by frequency.
    "query_patterns" -> Q(
      s"""WITH $qlogCte,
        |p AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY collection, operation, has_filter, k
        |                            ORDER BY latency_ms, ts) - 1 AS r,
        |         count(*) OVER (PARTITION BY collection, operation, has_filter, k) AS n
        |  FROM qlog
        |),
        |g AS (
        |  SELECT collection, operation,
        |         CAST(has_filter AS BIGINT) AS uses_filter,
        |         CAST(coalesce(k, 10) AS BIGINT) AS typical_k,
        |         count(*) AS n_events,
        |         round(sum(CAST(round(latency_ms * 1000) AS BIGINT)) / (count(latency_ms) * 1000.0), 6) AS avg_latency_ms,
        |         round(max(CASE WHEN r = n * 50 // 100 THEN latency_ms END), 6) AS p50_latency_ms,
        |         round(max(CASE WHEN r = n * 95 // 100 THEN latency_ms END), 6) AS p95_latency_ms,
        |         round(max(latency_ms), 6) AS p99_latency_ms,
        |         round(avg(result_count), 6) AS avg_result_count,
        |         min(ts) AS first_seen, max(ts) AS last_seen
        |  FROM p GROUP BY collection, operation, has_filter, k
        |)
        |SELECT * FROM g
        |ORDER BY n_events DESC, collection, operation, uses_filter, typical_k
        |LIMIT 15""".stripMargin
    ) { (s, dir) =>
      QueryAnalytics.patterns(qlog(s, dir))
        .select(col("collection"), col("operation"),
          col("uses_filter").cast("long").as("uses_filter"),
          col("typical_k").cast("long").as("typical_k"),
          col("count").as("n_events"),
          round(col("avg_latency_ms"), 6).as("avg_latency_ms"),
          round(col("p50_latency_ms"), 6).as("p50_latency_ms"),
          round(col("p95_latency_ms"), 6).as("p95_latency_ms"),
          round(col("p99_latency_ms"), 6).as("p99_latency_ms"),
          round(col("avg_result_count"), 6).as("avg_result_count"),
          col("first_seen"), col("last_seen"))
        .orderBy(col("n_events").desc, col("collection"), col("operation"),
          col("uses_filter"), col("typical_k"))
        .limit(15)
    },

    // Per-collection analytics (analytics.rs:429-456). Same fixed-point
    // hashing discipline as query_insights: the gate hashes micro-unit
    // BIGINT latency sums (recovered exactly from the operator's averages
    // by round(avg·n·1000)), never a rounded double quotient.
    "collection_analytics" -> Q(
      s"""WITH $qlogCte
        |SELECT collection,
        |       CAST(sum(CASE WHEN operation IN ('search', 'query') THEN 1 ELSE 0 END) AS BIGINT) AS total_queries,
        |       CAST(sum(CASE WHEN operation IN ('insert', 'upsert') THEN 1 ELSE 0 END) AS BIGINT) AS total_inserts,
        |       CAST(sum(CASE WHEN operation = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS total_deletes,
        |       CAST(coalesce(sum(CASE WHEN operation IN ('search', 'query') THEN lat_micro END), 0) AS BIGINT) AS search_lat_micro,
        |       CAST(coalesce(sum(CASE WHEN operation IN ('insert', 'upsert') THEN lat_micro END), 0) AS BIGINT) AS insert_lat_micro
        |FROM qlog GROUP BY collection ORDER BY collection""".stripMargin
    ) { (s, dir) =>
      QueryAnalytics.collectionAnalytics(qlog(s, dir))
        .select(col("collection"), col("total_queries"), col("total_inserts"),
          col("total_deletes"),
          round(col("avg_search_latency_ms") * col("total_queries") * 1000)
            .cast("long").as("search_lat_micro"),
          round(col("avg_insert_latency_ms") * col("total_inserts") * 1000)
            .cast("long").as("insert_lat_micro"))
        .orderBy(col("collection"))
    },
  )
}
