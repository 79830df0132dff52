package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Matryoshka truncation engine (SURVEY.md §2.3; reference:
  * src/indexing/quantization.rs:754-872 `MatryoshkaTruncation`).
  *
  * Prefix-truncated embeddings (MRL-style) support coarse search at a
  * fraction of the bytes; the truncated distance underestimates the
  * full-dim one, so the engine carries per-level correction factors:
  * calibrated variance ratios (truncated-dims variance / full variance
  * over a sample, clamped to [0.01, 1]) when available, else the
  * dimension-ratio heuristic `distance × full/truncated`. The two-phase
  * search in [[graft.ops.Search.matryoshka]] needs no correction (it
  * re-ranks exactly); correction matters when REPORTING coarse distances
  * or mixing levels — e.g. the adaptive search path.
  */
object Matryoshka {

  final case class Engine(fullDims: Int, levels: Seq[Int],
                          varianceRatios: Seq[Double] = Nil) {
    /** Best level ≤ maxDims, else full (quantization.rs:825-833). */
    def nearestLevel(maxDims: Int): Int =
      levels.find(_ <= maxDims).getOrElse(fullDims)

    /** quantization.rs:810-823 */
    def correctDistance(raw: Double, truncatedDims: Int): Double = {
      if (truncatedDims >= fullDims || truncatedDims == 0) return raw
      val idx = levels.indexOf(truncatedDims)
      if (idx >= 0 && idx < varianceRatios.size) raw / varianceRatios(idx)
      else raw * fullDims.toDouble / truncatedDims
    }

    def memorySavings(truncatedDims: Int): Double =
      if (truncatedDims == 0) 0.0 else fullDims.toDouble / truncatedDims

    /** Correction as a Column (for coarse-distance reporting at scale). */
    def correctDistanceCol(raw: Column, truncatedDims: Int): Column =
      lit(1.0) * correctDistance(1.0, truncatedDims) * raw
  }

  def apply(fullDims: Int, levels: Seq[Int]): Engine =
    Engine(fullDims, levels.filter(d => d > 0 && d < fullDims).sorted.reverse)

  /** Calibrate variance ratios on a bounded sample
    * (quantization.rs:778-799): ratio_l = Σ_d<l var_d / Σ_d<full var_d,
    * clamped to [0.01, 1]. Variance is computed per-dimension with the
    * biased (1/n) estimator, like the reference.
    */
  def calibrate(engine: Engine, df: DataFrame, vecCol: Column,
                maxSampleRows: Int = 10000): Engine = {
    if (engine.levels.isEmpty) return engine
    // per-dimension E[x] and E[x²] in one aggregation pass
    val stats = df.select(vecCol.cast("array<float>").as("v"))
      .limit(maxSampleRows)
      .select(posexplode(col("v")))
      .toDF("dim", "x")
      .groupBy("dim")
      .agg(avg(col("x")).as("mean"), avg(col("x") * col("x")).as("meansq"))
      .orderBy("dim").collect()
    val varPerDim = stats.map(r => r.getDouble(2) - r.getDouble(1) * r.getDouble(1))
    val cum = varPerDim.scanLeft(0.0)(_ + _) // cum(d) = Σ var over first d dims
    val fullVar = cum(math.min(engine.fullDims, varPerDim.length))
    if (fullVar < 1e-7) return engine
    val ratios = engine.levels.map { d =>
      val tv = cum(math.min(d, varPerDim.length))
      math.max(0.01, math.min(1.0, tv / fullVar))
    }
    engine.copy(varianceRatios = ratios)
  }
}
