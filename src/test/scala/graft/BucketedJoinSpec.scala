package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Proves the co-located-join layout (SURVEY §7 scale story): two tables
  * bucketed identically on the join key join with no Exchange in the
  * physical plan — the shuffle moved to write time, amortized over every
  * subsequent join. This is the layout the fact⋈fact joins (lineitem ⋈
  * orders) run on at 100 TB where neither side broadcasts.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("identically-bucketed tables join with zero exchanges") {
    val li = sf("lineitem").select("l_orderkey", "l_quantity")
    val o = sf("orders").select("o_orderkey", "o_custkey")
    Tables.writeBucketed(li, "li_b", "l_orderkey", numBuckets = 4)
    Tables.writeBucketed(o, "o_b", "o_orderkey", numBuckets = 4)
    try {
      // broadcast disabled so the only alternatives are shuffle vs bucket
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself reads bucketed scans directly: the ONLY exchange
      // allowed is the one after the join for the groupBy on o_custkey
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(plan).toSeq
      assert(exchanges.size <= 1, s"expected <=1 exchange, plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // and it computes the right thing
      val viaBucket = joined.agg(sum(col("q"))).as[Double].head()
      val direct = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity"))).as[Double].head()
      assert(math.abs(viaBucket - direct) < 1e-6)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
