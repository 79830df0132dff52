package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Workload-driven ANN tuning (SURVEY.md §4.1; reference: src/tuning.rs —
  * `auto_tune`/`tune` CLI search HNSW params against constraints).
  *
  * Our ANN is IVF, so the tunables are (numCells, nprobe). Unlike the
  * reference's closed-form latency model, we MEASURE: for each candidate
  * config, recall@k of the pruned search against exact ground truth over a
  * sampled query workload, plus the scan fraction (probed rows / total) —
  * the scale-honest cost proxy (at 100 TB the cost IS the fraction of
  * bytes scanned; wall-clock on a laptop sample is noise). The chosen
  * config is the smallest scan fraction whose mean recall clears the
  * target — exactly the trade `ef_search` sweeps make in
  * docs/benchmarks.md:51-54.
  */
object Tuner {

  final case class IvfConfig(numCells: Int, nprobe: Int)
  final case class Measurement(numCells: Int, nprobe: Int,
                               meanRecallAtK: Double, scanFraction: Double)
  final case class TuneResult(best: Option[IvfConfig],
                              frontier: Seq[Measurement])

  /** Sweep (numCells × nprobe) against `numQueries` sampled query vectors.
    * `minRecall` picks the cheapest passing config; frontier returns every
    * measurement for what-if analysis (tuning.rs:739 what_if_analysis).
    */
  def tuneIvf(df: DataFrame, idCol: String, vecCol: String, k: Int = 10,
              cellCandidates: Seq[Int] = Seq(4, 8, 16),
              nprobeCandidates: Seq[Int] = Seq(1, 2, 4, 8),
              numQueries: Int = 5, minRecall: Double = 0.9,
              metric: String = "cosine", seed: Long = 42L): TuneResult = {
    val queries: Seq[Array[Float]] = df
      .select(col(vecCol).cast("array<float>"))
      .limit(numQueries).collect().map(_.getSeq[Float](0).toArray).toSeq
    require(queries.nonEmpty, "tuneIvf needs at least one query vector")

    val n = df.count().toDouble
    val frontier = cellCandidates.flatMap { cells =>
      val ix = Ivf.build(df, col(vecCol), cells, metric, seed)
      val assigned = ix.assigned.persist()
      try {
      val cellSizes = assigned.groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val exactTops = queries.map { q =>
        df.withColumn("__d", Distances.distance(metric, col(vecCol), lit(q)))
          .orderBy(col("__d").asc, col(idCol).asc).limit(k)
          .select(idCol).collect().map(_.get(0)).toSet
      }
      val out = nprobeCandidates.filter(_ <= cells).map { nprobe =>
        val recalls = queries.zip(exactTops).map { case (q, exact) =>
          val approx = Ivf.search(ix, q, k, nprobe, idCol, vecCol)
            .select(idCol).collect().map(_.get(0)).toSet
          if (exact.isEmpty) 1.0
          else exact.intersect(approx).size.toDouble / exact.size
        }
        val scanned = queries.map { q =>
          Ivf.probeCells(ix, q, nprobe).map(c => cellSizes.getOrElse(c, 0L)).sum
        }.sum.toDouble / (queries.size * n)
        Measurement(cells, nprobe, recalls.sum / recalls.size, scanned)
      }
      out
      // per-candidate pin released even when a probe job throws mid-grid
      } finally assigned.unpersist()
    }
    val best = frontier.filter(_.meanRecallAtK >= minRecall)
      .sortBy(m => (m.scanFraction, m.numCells)).headOption
      .map(m => IvfConfig(m.numCells, m.nprobe))
    TuneResult(best, frontier)
  }

  /** Index-mode recommendation (reference: tuning.rs recommend_index
    * :559-690) translated to this engine's modes:
    * exact scan / IVF pruning / IVF + SQ8 two-phase / binary re-rank.
    */
  def recommendIndex(expectedVectors: Long, dimensions: Int,
                     targetRecall: Double = 0.95,
                     memoryBudgetBytes: Option[Long] = None): (String, Seq[String]) = {
    val vecBytes = expectedVectors * dimensions * 4L
    val reasons = Seq(
      s"Dataset: $expectedVectors vectors × $dimensions dimensions",
      f"Raw vector bytes: ${vecBytes / 1e9}%.1f GB")
    val budget = memoryBudgetBytes.getOrElse(16L * 1024 * 1024 * 1024)
    if (expectedVectors < 100000)
      ("exact", reasons :+ "Small dataset: exact top-k scan is optimal (recall 1.0)")
    else if (vecBytes <= budget)
      ("ivf", reasons :+ "Fits in memory: IVF cell pruning trades scan fraction for recall")
    else if (vecBytes / 4 <= budget || targetRecall >= 0.9)
      ("ivf+sq8", reasons :+ "Exceeds memory: SQ8 codes (4× smaller) + two-phase re-rank")
    else
      ("binary+rerank", reasons :+ "Far exceeds memory: 1-bit codes (32× smaller) + exact re-rank")
  }
}
