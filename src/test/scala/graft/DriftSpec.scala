package graft

import org.apache.spark.sql.functions._

import graft.ops.Drift

/** Embedding drift detection (reference: observe/drift.rs). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[Seq[Float]]) = rows.map(Tuple1(_)).toDF("vec")

  test("identical distributions: no drift, score 0, ratio 1") {
    val base = vecs((1 to 50).map(i => Seq(i * 0.01f, 1f - i * 0.01f)))
    val r = Drift.report(base, base, col("vec")).collect().head
    assert(math.abs(r.getAs[Double]("centroid_shift")) < 1e-12)
    assert(math.abs(r.getAs[Double]("variance_ratio") - 1.0) < 1e-9)
    assert(r.getAs[Double]("ks_statistic") < 0.05) // walk floor on equal sets
    assert(!r.getAs[Boolean]("is_drifting"))
  }

  test("rotated centroid trips the cosine-shift threshold") {
    val base = vecs(Seq.fill(30)(Seq(1f, 0f)))
    val cur = vecs(Seq.fill(30)(Seq(0f, 1f)))
    val r = Drift.report(base, cur, col("vec"), includeKs = false)
      .collect().head
    assert(math.abs(r.getAs[Double]("centroid_shift") - 1.0) < 1e-9)
    assert(r.getAs[Boolean]("is_drifting"))
    // variance leg is 0-vs-0 → ratio 1; score = 0.4·1 + 0
    assert(math.abs(r.getAs[Double]("drift_score") - 0.4) < 1e-9)
  }

  test("inflated variance trips the ratio threshold both directions") {
    val rnd = new scala.util.Random(4)
    val base = vecs(Seq.fill(200)(Seq(rnd.nextFloat(), rnd.nextFloat())))
    val wide = vecs(Seq.fill(200)(Seq(rnd.nextFloat() * 3, rnd.nextFloat() * 3)))
    val r1 = Drift.report(base, wide, col("vec"), includeKs = false)
      .collect().head
    assert(r1.getAs[Double]("variance_ratio") > 1.2 && r1.getAs[Boolean]("is_drifting"))
    val r2 = Drift.report(wide, base, col("vec"), includeKs = false)
      .collect().head
    assert(r2.getAs[Double]("variance_ratio") < 0.8 && r2.getAs[Boolean]("is_drifting"))
  }

  test("ks walk matches the reference pointer semantics on a hand case") {
    // b = [1,2,3], c = [10,20,30]: walk consumes all of b first;
    // first step diff = |1/3 − 1/3| = 0, then |2/3−1/3|, |3/3−1/3| → 2/3
    assert(math.abs(Drift.ksStatistic(Seq(1, 2, 3), Seq(10, 20, 30)) - 2.0 / 3) < 1e-12)
    // empty side → 0 (drift.rs:448-450)
    assert(Drift.ksStatistic(Nil, Seq(1.0)) == 0.0)
    // shifted copies of the same shape: strong separation
    assert(Drift.ksStatistic((1 to 100).map(_.toDouble),
      (101 to 200).map(_.toDouble)) > 0.9)
  }

  test("dimensionDrift isolates the shifted dimension") {
    val rnd = new scala.util.Random(11)
    val base = vecs(Seq.fill(150)(Seq(rnd.nextFloat(), rnd.nextFloat())))
    val cur = vecs(Seq.fill(150)(Seq(rnd.nextFloat() + 5f, rnd.nextFloat())))
    val d = Drift.dimensionDrift(base, cur, col("vec"))
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("drift_score")).toMap
    assert(d(0) > 10 * d(1), "shifted dim dominates the stable one")
  }
}
