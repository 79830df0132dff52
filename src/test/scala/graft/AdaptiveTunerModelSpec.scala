package graft

import graft.ann.AdaptiveTuner
import graft.ann.AdaptiveTuner.{Observation, Recommendation}

/** Model-based property test for the workload-aware adaptive tuner (the
  * LlmCacheModelSpec pattern): 200 seeded random observe/recommend/
  * feedback steps replayed against an independent reimplementation of
  * the documented semantics (tuning.rs:1448-1652 — 8 normalized
  * workload features, per-arm linear scores, argmax recommendation with
  * margin confidence, migrate iff the winner differs from the current
  * index, SGD toward reward 0.6·(recall−target)+0.4·(target−latency)/
  * target at lr 0.01, cold-start recommendation before any
  * observation). Recommendations AND all three weight vectors are
  * compared exactly after every step — the arithmetic is replicated
  * operation-for-operation, so drift of any kind fails the spec.
  */
class AdaptiveTunerModelSpec extends SparkSpec {

  private val targetRecall = 0.95
  private val targetLatencyMs = 50.0
  private val memoryBudget = 16L * 1024 * 1024 * 1024

  // ------------------------------------------------------------ the model
  // fresh mutable weight state per test run (the arrays are SGD-mutated)
  private final class ModelState {
    val mWeights: Map[String, Array[Double]] = Map(
      "ivf" -> Array(0.7, -0.05, 0.0, 0.1, -0.1, -0.2, 0.3, -0.2),
      "ivf+sq8" -> Array(0.4, 0.1, 0.0, -0.05, 0.05, 0.1, 0.1, 0.1),
      "binary+rerank" -> Array(0.2, 0.2, 0.0, -0.1, 0.0, 0.15, 0.05, 0.3))
  }

  private def mFeatures(o: Observation): Array[Double] = Array(
    1.0,
    (if (o.vectorCount > 0) math.log(o.vectorCount.toDouble) else 0.0) / 20.0,
    o.dimensions / 4096.0,
    math.min(o.qps / 1000.0, 1.0),
    if (o.qps + o.insertRate > 0) o.insertRate / (o.qps + o.insertRate)
    else 0.0,
    math.min(o.avgLatencyMs / targetLatencyMs, 2.0),
    math.max(targetRecall - o.measuredRecall, 0.0),
    math.min(o.memoryBytes.toDouble / memoryBudget, 2.0))

  private def mScore(w: Array[Double], f: Array[Double]): Double =
    w.zip(f).map { case (a, b) => a * b }.sum

  private def mRecommend(last: Option[Observation],
                         st: ModelState): Recommendation =
    last match {
      case None =>
        Recommendation("ivf",
          Seq("ivf" -> 0.7, "ivf+sq8" -> 0.4, "binary+rerank" -> 0.2),
          shouldMigrate = false, confidence = 0.5)
      case Some(obs) =>
        val f = mFeatures(obs)
        val scores = st.mWeights.toSeq
          .map { case (mode, w) => mode -> mScore(w, f) }
          .sortBy(-_._2)
        val confidence =
          math.min(math.abs(scores(0)._2 - scores(1)._2) /
            (math.abs(scores(0)._2) + 0.01), 1.0)
        Recommendation(scores.head._1, scores,
          shouldMigrate = scores.head._1 != obs.currentIndex, confidence)
    }

  private def mFeedback(obs: Observation, actualRecall: Double,
                        actualLatencyMs: Double, st: ModelState): Unit = {
    val f = mFeatures(obs)
    val reward = (actualRecall - targetRecall) * 0.6 +
      (targetLatencyMs - actualLatencyMs) / targetLatencyMs * 0.4
    st.mWeights.get(obs.currentIndex).foreach { w =>
      var i = 0
      while (i < w.length) { w(i) += 0.01 * reward * f(i); i += 1 }
    }
  }

  // ----------------------------------------------------------- the test
  for (seed <- Seq(11, 2026))
    test(s"200 random observe/recommend/feedback steps match the " +
        s"documented linear-scorer + SGD model exactly (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val modes = Seq("ivf", "ivf+sq8", "binary+rerank")
      val tuner = new AdaptiveTuner(targetRecall, targetLatencyMs,
        memoryBudget)
      val st = new ModelState
      val seen = scala.collection.mutable.ArrayBuffer.empty[Observation]

      def randomObs(): Observation = Observation(
        vectorCount = rnd.nextInt(3) match {
          case 0 => 0L
          case 1 => rnd.nextInt(100000).toLong
          case _ => 1000000L + rnd.nextInt(100000000)
        },
        dimensions = Seq(8, 384, 768, 4096)(rnd.nextInt(4)),
        qps = rnd.nextDouble() * 2000.0,
        insertRate = if (rnd.nextBoolean()) 0.0 else rnd.nextDouble() * 500.0,
        avgLatencyMs = rnd.nextDouble() * 150.0,
        measuredRecall = 0.5 + rnd.nextDouble() * 0.5,
        memoryBytes = math.abs(rnd.nextLong()) % (64L << 30),
        currentIndex = modes(rnd.nextInt(modes.size)))

      def checkRecommend(): Unit = {
        val got = tuner.recommend()
        val want = mRecommend(seen.lastOption, st)
        assert(got == want, s"recommendation diverged:\n$got\n$want")
      }

      def checkWeights(): Unit = modes.foreach { m =>
        assert(tuner.weightsFor(m) == st.mWeights(m).toSeq,
          s"weights for '$m' diverged")
      }

      checkRecommend() // cold start, before any observation
      (1 to 200).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 =>
            val o = randomObs()
            tuner.observe(o); seen += o
          case 1 =>
            checkRecommend()
          case 2 if seen.nonEmpty =>
            val o = seen(rnd.nextInt(seen.size))
            val r = 0.5 + rnd.nextDouble() * 0.5
            val l = rnd.nextDouble() * 150.0
            tuner.feedback(o, r, l)
            mFeedback(o, r, l, st)
          case _ => ()
        }
        checkWeights()
      }
      checkRecommend()
      // the run must have moved the weights off their initial values
      assert(modes.exists(m =>
        tuner.weightsFor(m) != Map(
          "ivf" -> Seq(0.7, -0.05, 0.0, 0.1, -0.1, -0.2, 0.3, -0.2),
          "ivf+sq8" -> Seq(0.4, 0.1, 0.0, -0.05, 0.05, 0.1, 0.1, 0.1),
          "binary+rerank" -> Seq(0.2, 0.2, 0.0, -0.1, 0.0, 0.15, 0.05, 0.3)
        )(m)))
    }
}
