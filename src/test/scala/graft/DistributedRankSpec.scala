package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.DistributedRank

/** DistributedRank vs the single-partition window ground truth: global
  * and grouped ranks, null group keys, skewed groups, tie handling, and
  * the no-single-partition-sort plan contract.
  */
class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  private def data(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong,
        if (rnd.nextInt(10) < 8) "hot" else s"g${rnd.nextInt(3)}",
        if (rnd.nextInt(20) == 0) null else s"k${rnd.nextInt(2)}",
        rnd.nextInt(50).toDouble)
    }.toDF("id", "grp", "sub", "v").repartition(7)
  }

  test("global rank equals the window ground truth, ties broken " +
      "identically by the full sort key") {
    val df = data(500, 11)
    val (ranked, cleanup) = DistributedRank.rankedByRange(
      df, keys = Nil, order = Seq(col("v").asc, col("id").asc),
      rankCol = "r", nCol = "n", numPartitions = 5)
    val got = ranked.select("id", "r", "n").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    cleanup()
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("v").asc, col("id").asc)) - 1)
      .select("id", "r").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got.size == 500)
    got.foreach { case (id, (r, n)) =>
      assert(n == 500L)
      assert(r == want(id), s"id $id")
    }
  }

  test("grouped rank with nullable keys matches per-group windows") {
    val df = data(400, 23)
    val (ranked, cleanup) = DistributedRank.rankedByRange(
      df, keys = Seq("grp", "sub"),
      order = Seq(col("v").desc, col("id").asc),
      rankCol = "r", nCol = "n", numPartitions = 6)
    val got = ranked.select("id", "grp", "sub", "r", "n").collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    cleanup()
    val w = Window.partitionBy(col("grp"), col("sub"))
      .orderBy(col("v").desc, col("id").asc)
    val want = df
      .withColumn("r", row_number().over(w) - 1)
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("grp"), col("sub"))))
      .select("id", "r", "n").collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getLong(2))).toMap
    assert(got == want)
  }

  test("empty input yields an empty ranked frame, not an error") {
    val df = data(10, 5).filter(lit(false))
    val (ranked, cleanup) = DistributedRank.rankedByRange(
      df, Nil, Seq(col("v").asc), "r", "n", 4)
    assert(ranked.count() == 0)
    cleanup()
    val (g, c2) = DistributedRank.rankedByRange(
      df, Seq("grp"), Seq(col("v").asc), "r", "n", 4)
    assert(g.count() == 0)
    c2()
  }

  test("the derived numPartitions default (<=0) ranks correctly and " +
      "respects the clamp bounds") {
    val df = data(300, 31) // 7 input partitions, shuffle.partitions = 4
    val (ranked, cleanup) = DistributedRank.rankedByRange(
      df, Nil, Seq(col("v").asc, col("id").asc), "r", "n") // default: derive
    val got = ranked.select("id", "r").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cleanup()
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("v").asc, col("id").asc)) - 1)
      .select("id", "r").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == want)
    // empty frame through the derived default: no error, empty result
    val (e, ce) = DistributedRank.rankedByRange(
      df.filter(lit(false)), Seq("grp"), Seq(col("v").asc), "r", "n")
    assert(e.count() == 0)
    ce()
    assert(DistributedRank.MaxDerivedPartitions == 4096)
  }

  test("the plan never sorts the whole input on one partition") {
    val df = data(300, 7)
    val (ranked, cleanup) = DistributedRank.rankedByRange(
      df, Nil, Seq(col("v").asc, col("id").asc), "r", "n", 5)
    val plan = ranked.queryExecution.executedPlan.toString
    cleanup()
    // a global window would plan Exchange SinglePartition before the sort
    assert(!plan.contains("SinglePartition"), plan)
  }
}
