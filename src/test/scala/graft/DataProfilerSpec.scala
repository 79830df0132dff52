package graft

import org.apache.spark.sql.functions._

import graft.ann.{AdaptiveTuner, DataProfiler, SmartIndexSelector}

class DataProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: normalized vectors detected, moments over the full corpus") {
    val unit = (0 until 200).map { i =>
      val a = i * 0.1
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat, 0f, 0f))
    }.toDF("id", "vec")
    val p = DataProfiler.profile(unit, col("vec"))
    assert(p.dimensions == 4)
    assert(p.sampleSize == 200)
    assert(math.abs(p.meanMagnitude - 1.0) < 1e-5)
    assert(p.stdMagnitude < 1e-5)
    assert(p.appearsNormalized)
    // ~half the entries are the two exact zeros (plus the odd cos(a)≈0)
    assert(p.sparsityRatio >= 0.5 && p.sparsityRatio < 0.55,
      s"sparsity: ${p.sparsityRatio}")
    assert(p.meanPairwiseDistance > 0.0)
  }

  test("profile: scaled non-normalized vectors flagged as such") {
    val big = (0 until 100).map(i => (i.toLong, Seq(10f + i, 5f, 3f)))
      .toDF("id", "vec")
    val p = DataProfiler.profile(big, col("vec"))
    assert(!p.appearsNormalized)
    assert(p.meanMagnitude > 10.0)
    assert(p.sparsityRatio == 0.0)
  }

  test("pairwise distances are step-capped at 1000 pairs") {
    val vs = Array.tabulate(100)(i => Array(i.toFloat, 0f))
    val d = DataProfiler.pairwiseDistances(vs)
    assert(d.length <= 1000)
    assert(d.length > 100)
    val two = DataProfiler.pairwiseDistances(vs.take(2))
    assert(two.length == 1 && math.abs(two(0) - 1.0) < 1e-9)
    assert(DataProfiler.pairwiseDistances(vs.take(1)).isEmpty)
  }

  test("estimators: degenerate inputs fall back per the reference rules") {
    assert(DataProfiler.estimateIntrinsicDim(Array(1.0, 2.0), 64) == 64.0)
    assert(DataProfiler.estimateClusters(Array.fill(30)(0.5)) == 1)
    assert(DataProfiler.estimateClusters(Array(1.0, 2.0)) == 1)
  }

  test("clustered corpus: histogram modes raise the cluster estimate") {
    // four equally-spaced tight clusters -> pairwise distances concentrate
    // at {~0, 50, 100, 150}; the 50/100 peaks are INTERIOR histogram
    // maxima (the reference's mode count ignores the two endpoint bins)
    val rnd = new scala.util.Random(7)
    val pts = (0 until 160).map { i =>
      val base = (i % 4) * 50f
      (i.toLong, Seq(base + rnd.nextFloat(), rnd.nextFloat()))
    }.toDF("id", "vec")
    val p = DataProfiler.profile(pts, col("vec"))
    assert(p.estimatedClusters >= 2, s"clusters: ${p.estimatedClusters}")
  }

  test("smart selection: small corpus -> exact; reasoning carries profile") {
    val emb = sf("embeddings")
    val sel = SmartIndexSelector.select(emb, col("embedding"),
      expectedVectors = Some(50000L))
    assert(sel.recommended == "exact")
    assert(sel.reasoning.exists(_.startsWith("Base recommendation")))
    assert(sel.confidence > 0.0 && sel.confidence <= 1.0)
    val selBig = SmartIndexSelector.select(emb, col("embedding"),
      expectedVectors = Some(1000000L))
    assert(selBig.recommended.startsWith("ivf"))
    assert(selBig.suggestedIvf.isDefined)
    assert(selBig.suggestedIvf.get.numCells == 1000)
  }

  test("adaptive tuner: cold start, scoring, and feedback shift weights") {
    val t = new AdaptiveTuner(targetRecall = 0.95, targetLatencyMs = 50.0)
    val cold = t.recommend()
    assert(cold.recommended == AdaptiveTuner.Ivf && !cold.shouldMigrate)
    val obs = AdaptiveTuner.Observation(vectorCount = 1000000, dimensions = 384,
      qps = 100, insertRate = 10, avgLatencyMs = 40, measuredRecall = 0.96,
      memoryBytes = 2L << 30, currentIndex = AdaptiveTuner.IvfSq8)
    t.observe(obs)
    val rec = t.recommend()
    assert(rec.scores.size == 3)
    assert(rec.shouldMigrate == (rec.recommended != AdaptiveTuner.IvfSq8))
    val before = t.weightsFor(AdaptiveTuner.IvfSq8)
    // strong positive reward: recall above target, latency under target
    t.feedback(obs, actualRecall = 1.0, actualLatencyMs = 10.0)
    val after = t.weightsFor(AdaptiveTuner.IvfSq8)
    assert(after.head > before.head, "bias weight should rise on reward")
    // other arms untouched
    assert(t.weightsFor(AdaptiveTuner.Ivf) == Seq(0.7, -0.05, 0.0, 0.1, -0.1, -0.2, 0.3, -0.2))
  }
}
