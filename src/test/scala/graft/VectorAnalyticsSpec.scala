package graft

import org.apache.spark.sql.functions._

import graft.ops.VectorAnalytics

class VectorAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("medoidApprox agrees with the exact medoid on clustered data") {
    val rnd = new scala.util.Random(3)
    val data = (0 until 400).map { i =>
      val c = if (i % 4 == 0) Array(5f, 5f) else Array(0f, 0f)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat))
    }.toDF("id", "v")
    val exact = VectorAnalytics.medoid(data, col("id"), col("v"))
      .select("id").as[Long].head()
    val approx = VectorAnalytics.medoidApprox(data, col("id"), col("v"))
      .select("id").as[Long].head()
    assert(approx == exact)
  }

  test("medoid size guard reroutes 50k rows to the linear path") {
    // 50k rows: the O(n²) form would materialize 2.5e9 pairs — the guard
    // must route to medoidApprox (one scan × 100 broadcast candidates)
    val big = spark.range(50000).select(col("id"),
      array((0 until 8).map(d =>
        sin(col("id") * (d + 1)).cast("float")): _*).as("v"))
    val got = VectorAnalytics.medoid(big, col("id"), col("v"))
      .collect()
    assert(got.length == 1) // completes = it took the linear path
    assert(got(0).getDouble(1) > 0)
  }

  test("medoidApprox totals are exact for the candidate it returns") {
    // tiny set: candidate set covers everything, so total_dist must equal
    // the definitional sum
    val data = Seq(
      (1L, Array(0f, 0f)), (2L, Array(1f, 0f)), (3L, Array(0f, 1f)),
      (4L, Array(5f, 5f))).toDF("id", "v")
    val approx = VectorAnalytics.medoidApprox(data, col("id"), col("v"))
      .as[(Long, Double)].head()
    val exact = VectorAnalytics.medoid(data, col("id"), col("v"))
      .as[(Long, Double)].head()
    assert(approx._1 == exact._1)
    assert(math.abs(approx._2 - exact._2) < 1e-6)
  }
}
