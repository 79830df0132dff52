package graft

import graft.ann.Tuner

class TunerSpec extends SparkSpec {

  test("IVF tuner: frontier is recall-monotone in nprobe; best meets target at minimal scan") {
    val emb = sf("embeddings").limit(400).cache()
    val r = Tuner.tuneIvf(emb, "vec_id", "embedding", k = 10,
      cellCandidates = Seq(4, 8), nprobeCandidates = Seq(1, 2, 4, 8),
      numQueries = 3, minRecall = 0.9)
    assert(r.frontier.nonEmpty)
    // full probe (nprobe == cells) must hit recall 1.0 and scan everything
    val full = r.frontier.filter(m => m.nprobe == m.numCells)
    assert(full.forall(m => m.meanRecallAtK == 1.0))
    assert(full.forall(m => math.abs(m.scanFraction - 1.0) < 1e-9))
    // recall never decreases as nprobe grows within a cell count
    r.frontier.groupBy(_.numCells).foreach { case (_, ms) =>
      val sorted = ms.sortBy(_.nprobe)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b.meanRecallAtK >= a.meanRecallAtK - 1e-9)
        case _         =>
      }
    }
    // a passing config exists (full probe always qualifies)
    assert(r.best.isDefined)
    val bestM = r.frontier.find(m =>
      m.numCells == r.best.get.numCells && m.nprobe == r.best.get.nprobe).get
    assert(bestM.meanRecallAtK >= 0.9)
    // chosen config scans no more than ANY other passing config
    r.frontier.filter(_.meanRecallAtK >= 0.9).foreach(m =>
      assert(bestM.scanFraction <= m.scanFraction + 1e-9))
  }

  test("index-mode recommendation thresholds") {
    assert(Tuner.recommendIndex(50000, 384)._1 == "exact")
    assert(Tuner.recommendIndex(1000000, 384)._1 == "ivf")
    // 100M × 768d ≈ 307 GB raw > 16 GB default budget → quantized
    val (mode, why) = Tuner.recommendIndex(100000000L, 768)
    assert(mode == "ivf+sq8" && why.exists(_.contains("two-phase")))
  }
}
