package graft

import org.apache.spark.sql.functions._

import graft.ann.Matryoshka

class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  test("levels sort descending, nearest_level and memory_savings (quantization.rs:767-848)") {
    val e = Matryoshka(fullDims = 64, levels = Seq(16, 32, 8, 64, 0))
    assert(e.levels == Seq(32, 16, 8)) // 64 and 0 dropped, descending
    assert(e.nearestLevel(20) == 16)
    assert(e.nearestLevel(40) == 32)
    assert(e.nearestLevel(4) == 64) // nothing fits → full
    assert(e.memorySavings(16) == 4.0)
  }

  test("uncalibrated correction uses the dimension-ratio heuristic") {
    val e = Matryoshka(64, Seq(16))
    assert(e.correctDistance(0.5, 16) == 0.5 * 64.0 / 16)
    assert(e.correctDistance(0.5, 64) == 0.5)  // full dims → unchanged
    assert(e.correctDistance(0.5, 48) == 0.5 * 64.0 / 48) // unknown level → heuristic
  }

  test("calibrated ratios divide raw distance; ratio reflects variance mass") {
    val emb = sf("embeddings").limit(500)
    val e0 = Matryoshka(64, Seq(32, 16))
    val e = Matryoshka.calibrate(e0, emb, col("embedding"))
    assert(e.varianceRatios.size == 2)
    // prefix variance is a subset of total variance → ratios in (0, 1]
    assert(e.varianceRatios.forall(r => r > 0.0 && r <= 1.0))
    // more dims → more variance captured
    assert(e.varianceRatios.head >= e.varianceRatios(1))
    // corrected distance = raw / ratio ≥ raw
    val raw = 0.4
    assert(e.correctDistance(raw, 32) == raw / e.varianceRatios.head)
    assert(e.correctDistance(raw, 32) >= raw)
  }

  test("calibrated coarse distance approximates the full distance in expectation") {
    val emb = sf("embeddings").limit(300).cache()
    val e = Matryoshka.calibrate(Matryoshka(64, Seq(16)), emb, col("embedding"))
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .as[Seq[Float]].head().toArray
    val rows = emb.select(
      graft.functions.Distances.euclidean(col("embedding"), lit(q)).as("full"),
      graft.functions.Distances.euclidean(
        slice(col("embedding"), 1, 16), lit(q.take(16))).as("coarse"))
      .as[(Double, Double)].collect()
    // squared-distance correction: corrected ≈ full on average. Euclidean is
    // a sqrt away, so compare the MEANS of squares within a loose band.
    val meanFullSq = rows.map(r => r._1 * r._1).sum / rows.length
    val corrected = rows.map(r => e.correctDistance(r._2 * r._2, 16)).sum / rows.length
    assert(corrected > meanFullSq * 0.5 && corrected < meanFullSq * 2.0,
      s"corrected mean $corrected vs full $meanFullSq")
  }
}
