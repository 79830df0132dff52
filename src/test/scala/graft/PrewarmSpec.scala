package graft

import org.apache.spark.sql.functions._

import graft.ops.Prewarm

/** Predictive query pre-warming (reference: experimental/query_prewarming.rs). */
class PrewarmSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L

  private def hist(rows: (String, Seq[Float], Long, Long)*) =
    rows.toDF("collection", "embedding", "k", "ts")

  test("temporal similarity is circular in hours and days") {
    val df = Seq((23, 0, 0, 0), (0, 0, 12, 0), (0, 0, 0, 6), (5, 3, 5, 3))
      .toDF("ha", "da", "hb", "db")
      .withColumn("s", Prewarm.temporalSimilarity(col("ha"), col("da"),
        col("hb"), col("db")))
    val s = df.collect().map(_.getAs[Double]("s"))
    // hour 23 vs 0 = circular diff 1 → 0.7·(1−1/12) + 0.3·1
    assert(math.abs(s(0) - (0.7 * (1 - 1.0 / 12) + 0.3)) < 1e-12)
    // opposite hour → hour leg 0
    assert(math.abs(s(1) - 0.3) < 1e-12)
    // day 0 vs 6 = circular diff 1 → 0.3·(1−1/3.5) + 0.7
    assert(math.abs(s(2) - (0.7 + 0.3 * (1 - 1.0 / 3.5))) < 1e-12)
    assert(s(3) == 1.0)
  }

  test("fewer than 3 logged queries yields no predictions (rs:203-205)") {
    val h = hist(("a", Seq(1f), 10L, 0L), ("a", Seq(1f), 10L, 1L))
    assert(Prewarm.predictNext(h, now = 10L, limit = 5).count() == 0)
  }

  test("prediction is the score-weighted centroid; confidence gates output") {
    val now = 1000 * H
    // three fresh same-hour patterns in 'a', one ancient in 'b'
    val h = hist(
      ("a", Seq(1f, 0f), 10L, now - 24 * H), // sim 1, decay^24
      ("a", Seq(0f, 1f), 20L, now),          // sim 1, decay^0
      ("a", Seq(1f, 1f), 30L, now - 48 * H),
      ("b", Seq(5f, 5f), 10L, now - 2000 * H))
    val p = Prewarm.predictNext(h, now, limit = 5,
      Prewarm.Config(confidenceThreshold = 0.4)).collect()
    assert(p.map(_.getString(0)).toSeq == Seq("a"),
      "stale collection b falls below the confidence threshold")
    val r = p.head
    // same hour every 24h, but the DAY leg decays: day-diff d → 1 − d/3.5
    def sim(dayDiff: Int) = 0.7 + 0.3 * (1.0 - dayDiff / 3.5)
    val w0 = sim(1) * math.pow(0.95, 24)
    val w1 = 1.0
    val w2 = sim(2) * math.pow(0.95, 48)
    val t = w0 + w1 + w2
    val c = r.getSeq[Float](1)
    assert(math.abs(c(0) - ((w0 + w2) / t).toFloat) < 1e-6)
    assert(math.abs(c(1) - ((w1 + w2) / t).toFloat) < 1e-6)
    assert(math.abs(r.getAs[Double]("confidence") - (t / 3)) < 1e-9)
    assert(r.getAs[Long]("avg_k") == 20L)
  }

  test("hitRate counts collections queried again inside the window") {
    val now = 100L
    val preds = Seq(("a", Seq(1f), 0.9, 10L), ("b", Seq(1f), 0.8, 10L))
      .toDF("collection", "predicted_embedding", "confidence", "avg_k")
    val future = hist(("a", Seq(1f), 10L, now + 5), ("c", Seq(1f), 10L, now + 6),
      ("b", Seq(1f), 10L, now + 9999))
    val r = Prewarm.hitRate(preds, future, now, windowSecs = 100L)
      .collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 1 &&
      math.abs(r.getDouble(2) - 0.5) < 1e-12)
  }
}
