package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding drift detection (reference: src/observe/drift.rs) — compare a
  * current window of embeddings against a baseline distribution: centroid
  * shift (cosine), total variance ratio, a magnitude KS statistic,
  * per-dimension drift, and a weighted overall score.
  *
  * Spark re-expression: the reference folds Welford accumulators per
  * vector; mean/variance are associative, so both sides of the comparison
  * are grouped aggregations over posexploded (dim, value) pairs — one
  * shuffle keyed by dimension. The KS statistic walks two sorted magnitude
  * arrays with the reference's exact pointer semantics (drift.rs:447-482 —
  * note it reads CDFs at i+1/j+1 BEFORE advancing, a deliberate port);
  * magnitudes are collected driver-side, bounded by the window contract
  * (the reference keeps both lists in memory too).
  */
object Drift {

  /** Thresholds (drift.rs:56-66 defaults). */
  case class Config(centroidThreshold: Double = 0.1,
                    varianceThreshold: Double = 0.2,
                    ksThreshold: Double = 0.1)

  /** Per-dimension stats: (dim, mean, variance [sample, n−1], min, max). */
  def vectorStats(df: DataFrame, vecCol: Column): DataFrame =
    df.select(posexplode(vecCol).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
      .groupBy(col("dim"))
      .agg(avg(col("x")).as("mean"),
        coalesce(var_samp(col("x")), lit(0.0)).as("variance"),
        min(col("x")).as("min"), max(col("x")).as("max"))

  /** Per-dimension drift (drift.rs:485-521): |mean shift| (also normalized
    * by the baseline's range), variance ratio, and the combined score
    * (normalized_shift + |ratio − 1|) / 2.
    */
  def dimensionDrift(baseline: DataFrame, current: DataFrame,
                     vecCol: Column): DataFrame = {
    val b = vectorStats(baseline, vecCol)
      .select(col("dim"), col("mean").as("b_mean"), col("variance").as("b_var"),
        col("min").as("b_min"), col("max").as("b_max"))
    val c = vectorStats(current, vecCol)
      .select(col("dim"), col("mean").as("c_mean"), col("variance").as("c_var"))
    b.join(c, "dim")
      .withColumn("mean_shift", abs(col("c_mean") - col("b_mean")))
      .withColumn("variance_ratio",
        when(col("b_var") > 0, col("c_var") / col("b_var")).otherwise(1.0))
      .withColumn("__range", col("b_max") - col("b_min"))
      .withColumn("__norm_shift",
        when(col("__range") > 0, col("mean_shift") / col("__range"))
          .otherwise(col("mean_shift")))
      .withColumn("drift_score",
        (col("__norm_shift") + abs(col("variance_ratio") - 1.0)) / 2.0)
      .select(col("dim"), col("mean_shift"), col("variance_ratio"),
        col("drift_score"))
  }

  /** The reference's two-sample KS pointer walk over sorted magnitudes
    * (drift.rs:447-482), ported verbatim.
    */
  def ksStatistic(baseline: Seq[Double], current: Seq[Double]): Double = {
    if (baseline.isEmpty || current.isEmpty) return 0.0
    val b = baseline.sorted; val c = current.sorted
    val n1 = b.length.toDouble; val n2 = c.length.toDouble
    var maxDiff = 0.0; var i = 0; var j = 0
    while (i < b.length && j < c.length) {
      val diff = math.abs((i + 1) / n1 - (j + 1) / n2)
      if (diff > maxDiff) maxDiff = diff
      if (b(i) <= c(j)) i += 1 else j += 1
    }
    maxDiff
  }

  private def magnitudes(df: DataFrame, vecCol: Column): Seq[Double] =
    df.select(sqrt(aggregate(vecCol, lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("m"))
      .collect().map(_.getDouble(0)).toSeq

  /** One-row drift report (drift.rs:352-418): centroid shift (cosine
    * distance of the mean vectors), total variance ratio, optional KS on
    * magnitudes, weighted score 0.4/0.3/0.3, and the is_drifting
    * threshold disjunction.
    */
  def report(baseline: DataFrame, current: DataFrame, vecCol: Column,
             config: Config = Config(), includeKs: Boolean = true): DataFrame = {
    val b = vectorStats(baseline, vecCol)
      .select(col("dim"), col("mean").as("b_mean"), col("variance").as("b_var"))
    val c = vectorStats(current, vecCol)
      .select(col("dim"), col("mean").as("c_mean"), col("variance").as("c_var"))
    val ks = if (includeKs)
      ksStatistic(magnitudes(baseline, vecCol), magnitudes(current, vecCol))
    else 0.0
    b.join(c, "dim").agg(
        sum(col("b_mean") * col("c_mean")).as("__dot"),
        sqrt(sum(col("b_mean") * col("b_mean"))).as("__mb"),
        sqrt(sum(col("c_mean") * col("c_mean"))).as("__mc"),
        sum(col("b_var")).as("__bv"), sum(col("c_var")).as("__cv"))
      .withColumn("centroid_shift",
        when(col("__mb") === 0 || col("__mc") === 0, lit(1.0))
          .otherwise(lit(1.0) -
            least(greatest(col("__dot") / (col("__mb") * col("__mc")),
              lit(-1.0)), lit(1.0))))
      .withColumn("variance_ratio",
        when(col("__bv") === 0, lit(1.0)).otherwise(col("__cv") / col("__bv")))
      .withColumn("ks_statistic", lit(ks))
      .withColumn("drift_score",
        least(col("centroid_shift") / config.centroidThreshold, lit(1.0)) * 0.4 +
          least(abs(col("variance_ratio") - 1.0) / config.varianceThreshold,
            lit(1.0)) * 0.3 +
          least(col("ks_statistic") / config.ksThreshold, lit(1.0)) * 0.3)
      .withColumn("is_drifting",
        col("centroid_shift") > config.centroidThreshold ||
          col("variance_ratio") > 1.0 + config.varianceThreshold ||
          col("variance_ratio") < 1.0 - config.varianceThreshold ||
          col("ks_statistic") > config.ksThreshold)
      .select(col("centroid_shift"), col("variance_ratio"),
        col("ks_statistic"), col("drift_score"), col("is_drifting"))
  }
}
