package graft

import org.apache.spark.sql.functions._

import graft.ops.AdaptiveFusion
import graft.text.Rrf

class AdaptiveFusionSpec extends SparkSpec {
  import spark.implicits._

  private def fb(f: AdaptiveFusion, query: String, relevant: Boolean,
                 position: Int = 0, v: Double = 0.5, b: Double = 0.5) =
    f.recordFeedback(f.Feedback(query, relevant, position, v, b))

  test("below minSamples the rule-based preset is used") {
    val f = new AdaptiveFusion(minSamples = 10)
    // semantic preset for question queries
    val w = f.weightsFor("how does this work?")
    assert(math.abs(w.vectorWeight - 0.7) < 1e-9)
    fb(f, "how does this work?", relevant = true, v = 0.1, b = 0.9)
    // one sample < minSamples → still preset
    val w2 = f.weightsFor("how does this work?")
    assert(math.abs(w2.vectorWeight - 0.7) < 1e-9)
  }

  test("learned weights blend in after minSamples and are normalized") {
    val f = new AdaptiveFusion(minSamples = 3)
    (1 to 5).foreach(_ => fb(f, "how does this work?", relevant = true,
      position = 0, v = 0.2, b = 0.8))
    val w = f.weightsFor("how does this work?")
    // blend = min(5/8, 0.8) = 0.625; v = 0.7*0.375 + 0.2*0.625 = 0.3875
    assert(math.abs(w.vectorWeight - 0.3875 / (0.3875 + 0.6125)) < 1e-9)
    assert(math.abs(w.vectorWeight + w.bm25Weight - 1.0) < 1e-9)
  }

  test("negative feedback shrinks sums, never samples, clamps at zero (hybrid.rs:1247)") {
    val f = new AdaptiveFusion(learningRate = 0.2, minSamples = 3)
    (1 to 5).foreach(_ => fb(f, "test query", relevant = true))
    val before = f.stats
    fb(f, "test query", relevant = false, position = 5)
    assert(f.stats.totalFeedback == before.totalFeedback)
    // heavy negative feedback floors at zero instead of going negative
    (1 to 100).foreach(_ => fb(f, "test query", relevant = false, v = 1.0, b = 1.0))
    val ts = f.stats.byType.values.head
    assert(ts.avgVectorWeight >= 0 && ts.avgBm25Weight >= 0)
  }

  test("position weighting: top-position feedback teaches more") {
    val f = new AdaptiveFusion(minSamples = 1)
    fb(f, "plain words", relevant = true, position = 0, v = 1.0, b = 0.0)
    fb(f, "plain words", relevant = true, position = 9, v = 0.0, b = 1.0)
    val ts = f.stats.byType.values.head
    // v got weight 1/1, b got 1/10 → learned ratio leans heavily vector
    assert(ts.avgVectorWeight > 0.85)
  }

  test("disabled adaptive mode returns base for every query (hybrid.rs:1234)") {
    val f = new AdaptiveFusion(base = Rrf.Config.default)
    f.adaptiveEnabled = false
    val w1 = f.weightsFor("API_KEY")
    val w2 = f.weightsFor("how does this work?")
    assert(w1.vectorWeight == w2.vectorWeight && w1.bm25Weight == w2.bm25Weight)
  }

  test("reset clears; export/import round-trips (hybrid.rs:1280,1205)") {
    val f = new AdaptiveFusion()
    fb(f, "test", relevant = true)
    assert(f.stats.totalFeedback > 0)
    val exported = f.exportWeights()
    val g = new AdaptiveFusion()
    g.importWeights(exported)
    assert(g.stats.totalFeedback == f.stats.totalFeedback)
    f.reset()
    assert(f.stats.totalFeedback == 0)
  }

  test("recordBatch replays a feedback frame in explicit order") {
    val f = new AdaptiveFusion(minSamples = 1, learningRate = 0.5)
    val feedback = Seq(
      (1L, "plain words", true, 0, 0.8, 0.2),
      (2L, "plain words", false, 0, 0.8, 0.2), // negative AFTER positive: shrinks
      (3L, "plain words", true, 0, 0.6, 0.4))
      .toDF("seq", "query", "relevant", "position", "vector_weight", "bm25_weight")
    f.recordBatch(feedback, "seq")
    assert(f.stats.totalFeedback == 2) // negatives don't count samples
    // and the learned search config actually drives fusion
    val vtop = Seq(("a", 0.1), ("b", 0.2)).toDF("id", "distance")
    val btop = Seq(("b", 5.0), ("c", 4.0)).toDF("id", "score")
    val (fused, cfg) = f.search("plain words", vtop, btop, limit = 3)
    assert(fused.count() == 3)
    assert(math.abs(cfg.vectorWeight + cfg.bm25Weight - 1.0) < 1e-9)
  }
}
