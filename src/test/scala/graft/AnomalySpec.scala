package graft

import org.apache.spark.sql.functions._

import graft.ops.Anomaly

/** LOF + Isolation Forest (reference: observe/anomaly.rs). */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("LOF: a point far from a tight cluster scores highest") {
    val rnd = new scala.util.Random(3)
    val cluster = (0 until 40).map(i =>
      (i.toLong, Seq(rnd.nextFloat() * 0.1f, rnd.nextFloat() * 0.1f)))
    val outlier = Seq((99L, Seq(5f, 5f)))
    val df = (cluster ++ outlier).toDF("id", "vec")
    val scores = Anomaly.lof(df, col("id"), col("vec"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(99L) == scores.values.max, "planted outlier tops LOF")
    assert(scores(99L) > 2.0, s"outlier score ${scores(99L)} should be large")
    assert(cluster.forall { case (i, _) => scores(i) < 2.0 },
      "cluster members stay near 1")
  }

  test("LOF: hand-computed 4-point line matches the formula (k=2)") {
    // points at x = 0, 1, 2, 10 — k=2 neighborhoods are easy to fold by hand
    val df = Seq((0L, Seq(0f)), (1L, Seq(1f)), (2L, Seq(2f)), (3L, Seq(10f)))
      .toDF("id", "vec")
    val edges = Anomaly.exactKnnEdges(df, col("id"), col("vec"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(edges == Set((0L, 1L, 1.0), (0L, 2L, 2.0), (1L, 0L, 1.0), (1L, 2L, 1.0),
      (2L, 1L, 1.0), (2L, 0L, 2.0), (3L, 2L, 8.0), (3L, 1L, 9.0)))
    val scores = Anomaly.lofFromEdges(edges.toSeq.toDF("src", "dst", "distance"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // kdist: 0→2, 1→1, 2→2, 3→9
    // lrd0 = 2/(max(1,1)+max(2,2)) = 2/3; lrd1 = 2/(max(1,2)+max(1,2)) = 1/2
    // lrd2 = 2/(max(1,1)+max(2,2)) = 2/3; lrd3 = 2/(max(8,2)+max(9,1)) = 2/17
    assert(math.abs(scores(1L) - (2.0 / 3 + 2.0 / 3) / (2 * 0.5)) < 1e-9)
    assert(math.abs(scores(3L) - (2.0 / 3 + 0.5) / (2 * 2.0 / 17)) < 1e-9)
    assert(scores(3L) > 4.0 && scores(3L) == scores.values.max)
  }

  test("LOF degenerate density: exact duplicates score 1.0 (infinite lrd)") {
    val df = Seq((0L, Seq(1f, 1f)), (1L, Seq(1f, 1f)), (2L, Seq(1f, 1f)),
      (3L, Seq(8f, 8f))).toDF("id", "vec")
    val scores = Anomaly.lof(df, col("id"), col("vec"), k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // ids 0-2 are coincident: reach sums 0 → infinite lrd → LOF 1.0
    assert(Seq(0L, 1L, 2L).forall(i => scores(i) == 1.0))
  }

  test("blocked edges at full probe == exact edges; lofBlocked == lof") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 80).map(i => (i.toLong,
      Seq(rnd.nextFloat() * (1 + i % 3), rnd.nextFloat() * (1 + i % 2)))) ++
      Seq((900L, Seq(8f, 8f)))
    val df = pts.toDF("id", "vec")
    val exact = Anomaly.exactKnnEdges(df, col("id"), col("vec"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blockedFull = Anomaly.blockedKnnEdges(df, col("id"), col("vec"),
        k = 4, numCells = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blockedFull == exact,
      "full-probe blocked candidate set must be complete")
    val lofExact = Anomaly.lof(df, col("id"), col("vec"), k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lofBlk = Anomaly.lofBlocked(df, col("id"), col("vec"), k = 4,
        numCells = 8, nprobe = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lofExact.keySet == lofBlk.keySet)
    lofExact.foreach { case (id, s) =>
      assert(math.abs(s - lofBlk(id)) < 1e-9, s"id $id: $s vs ${lofBlk(id)}")
    }
    // pruned probe still finds the planted outlier on top
    val pruned = Anomaly.lofBlocked(df, col("id"), col("vec"), k = 4,
        numCells = 8, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pruned(900L) == pruned.values.max)
  }

  test("blockedKnnEdges plans equi-joins only (no cartesian, no BNLJ)") {
    val df = (0 until 50).map(i => (i.toLong, Seq(i.toFloat, 1f)))
      .toDF("id", "vec")
    val plan = Anomaly.blockedKnnEdges(df, col("id"), col("vec"), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("exactKnnEdges refuses unbounded all-pairs") {
    val big = (0 until 50).map(i => (i.toLong, Seq(i.toFloat))).toDF("id", "vec")
    intercept[IllegalArgumentException](
      Anomaly.exactKnnEdges(big, col("id"), col("vec"), 5, maxExactRows = 10))
  }

  test("isolation forest: planted outlier scores higher; seeded = deterministic") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 300).map(i =>
      (i.toLong, Seq(rnd.nextFloat(), rnd.nextFloat()))) :+ (999L, Seq(30f, 30f))
    val df = rows.toDF("id", "vec")
    val forest = Anomaly.Forest.fit(df, col("vec"), nTrees = 50,
      sampleSize = 64, seed = 7L)
    val scored = df.withColumn("s", forest.scoreCol(col("vec")))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("s")).toMap
    assert(scored(999L) == scored.values.max, "outlier isolates fastest")
    assert(scored(999L) > 0.6)
    val again = Anomaly.Forest.fit(df, col("vec"), 50, 64, seed = 7L)
    assert(math.abs(again.score(Seq(30f, 30f)) - scored(999L)) < 1e-12,
      "same seed, same forest")
  }
}
