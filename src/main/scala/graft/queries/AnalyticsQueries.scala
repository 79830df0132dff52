package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Analytics
import graft.ops.Analytics._

/** Metadata-analytics queries (SURVEY.md §2.6) over the TPC-H-ish testdata.
  * Double-valued aggregates are rounded to 4 decimals on both sides so
  * accumulation-order differences between Spark and DuckDB cannot flip the
  * hash; group keys and counts are exact.
  */
object AnalyticsQueries {

  val defs: Map[String, Q] = Map(
    // Pricing-summary style aggregate: the canonical filter->group->agg
    // pipeline of sql_analytics.rs:231-340.
    "q1_agg" -> Q(
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(l_extendedprice), 4) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // GROUP BY + HAVING on aggregates (sql_analytics.rs HAVING path) via the
    // Analytics builder.
    "q2_having" -> Q(
      """SELECT o_orderpriority,
        |       count(*) AS n_orders,
        |       round(sum(o_totalprice), 4) AS total,
        |       round(avg(o_totalprice), 4) AS avg_price
        |FROM orders
        |WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority
        |HAVING count(*) > 1000
        |ORDER BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      // threshold 1000 actually CUTS groups at sf0.01 (2-HIGH 989,
      // 4-NOT SPECIFIED 977 drop; 1-URGENT/3-MEDIUM/5-LOW survive) — the
      // former > 10 was vacuous there, so a skipped-HAVING mutation was
      // gate-invisible (r19 audit)
      Analytics.AnalyticsQuery(
        where = Some(col("o_orderstatus") === "O"),
        groupBy = Seq("o_orderpriority"),
        aggs = Seq(CountAll("n_orders"), Sum("o_totalprice", "total"),
          Avg("o_totalprice", "avg_price")),
        having = Some(col("n_orders") > 1000),
        orderBy = Seq(col("o_orderpriority"))
      ).run(Tables.load(s, dir, "orders"))
        .select(col("o_orderpriority"), col("n_orders"),
          round(col("total"), 4).as("total"),
          round(col("avg_price"), 4).as("avg_price"))
    },

    // COUNT_DISTINCT — exact, matching NeedleQL session aggregates
    // (query_lang/session.rs:14-27).
    "q3_count_distinct" -> Q(
      """SELECT c_mktsegment,
        |       count(DISTINCT c_nationkey) AS n_nations,
        |       count(*) AS n_customers,
        |       round(min(c_acctbal), 4) AS min_bal,
        |       round(max(c_acctbal), 4) AS max_bal
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"),
          round(min(col("c_acctbal")), 4).as("min_bal"),
          round(max(col("c_acctbal")), 4).as("max_bal"))
        .orderBy(col("c_mktsegment"))
    },

    // Multi-way join + top-k revenue (exercises broadcast of small dims and
    // TakeOrderedAndProject — shape that holds at 100 TB).
    "q4_join_topk" -> Q(
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name
        |LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("n_name"))
        .limit(10)
    },

    // TPC-H Q5 shape over the full dimension chain — the one query that
    // touches region/supplier/part: local-supply revenue per nation within
    // one region, sized parts only. Plan: the fact table is the only
    // shuffled input; every dimension broadcasts; the p_size filter pushes
    // to the parquet scan.
    "q5_region_revenue" -> Q(
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN part     ON l_partkey = p_partkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND p_size <= 25
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin
    ) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val su = Tables.load(s, dir, "supplier")
      val p = Tables.load(s, dir, "part").filter(col("p_size") <= 25)
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
  )
}
