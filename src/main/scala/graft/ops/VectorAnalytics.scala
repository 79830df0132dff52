package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Distances, VectorAgg}

/** Vector aggregation operators (SURVEY.md §2.6; reference:
  * src/experimental/vector_aggregation.rs).
  *
  * All formulas match the reference's f64-accumulation semantics
  * (vector_aggregation.rs:28-75): centroids are f64 sums divided by n then
  * truncated to f32 per element (:91-116); spread is the *mean squared*
  * distance to the centroid (:163-185); outliers use population std-dev
  * z-scores (:381-425); distribution histograms bin distance-to-centroid
  * with `min(bins-1)` edge clamping (:296-370); the medoid minimizes total
  * distance to all other vectors (:117-162).
  *
  * Scale shape: centroids go through the [[VectorAgg]] typed Aggregator
  * (shuffle = groups × dims, map-side combined); spread/outliers/
  * distribution re-join the small centroid table back over one scan
  * (broadcast); the medoid's definitional pairwise self-join is O(n²), so
  * above `maxExactRows` it automatically reroutes to the centroid-pruned
  * [[medoidApprox]] (exact totals for a broadcast candidate set — O(n·C)).
  */
object VectorAnalytics {

  /** Per-group centroid, one row per (group, dim) — f32-truncated like the
    * reference. `groupCols` may be empty for a global centroid.
    */
  def centroid(df: DataFrame, vecCol: Column, groupCols: Seq[Column]): DataFrame = {
    val agg = if (groupCols.nonEmpty)
      df.groupBy(groupCols: _*).agg(VectorAgg.centroidF(vecCol).as("centroid"))
    else df.agg(VectorAgg.centroidF(vecCol).as("centroid"))
    agg.select((groupCols :+ posexplode(col("centroid")).as(Seq("dim", "value"))): _*)
  }

  /** Per-group centroid kept as an ARRAY&lt;FLOAT&gt; column (internal). */
  def centroidVec(df: DataFrame, vecCol: Column, groupCols: Seq[Column]): DataFrame =
    if (groupCols.nonEmpty)
      df.groupBy(groupCols: _*).agg(VectorAgg.centroidF(vecCol).as("centroid"))
    else df.agg(VectorAgg.centroidF(vecCol).as("centroid"))

  /** Medoid: the vector minimizing total distance to all others
    * (reference: vector_aggregation.rs:117-162). Ties break by id.
    *
    * The definitional form is an O(n²) self-join, so it is guarded: above
    * `maxExactRows` the call routes to [[medoidApprox]] (centroid-pruned
    * candidates, linear in n). At sf-correctness scale the guard never
    * trips, keeping the exact semantics the oracle checks.
    */
  def medoid(df: DataFrame, idCol: Column, vecCol: Column,
             metric: String = "euclidean",
             maxExactRows: Int = 10000): DataFrame = {
    if (df.limit(maxExactRows + 1).count() > maxExactRows)
      return medoidApprox(df, idCol, vecCol, metric)
    val a = df.select(idCol.as("id"), vecCol.as("va"))
    val b = df.select(idCol.as("id_b"), vecCol.as("vb"))
    a.join(b, col("id") =!= col("id_b"))
      .withColumn("d", Distances.distance(metric, col("va"), col("vb")))
      .groupBy(col("id"))
      .agg(sum(col("d")).as("total_dist"))
      .orderBy(round(col("total_dist"), 4).asc, col("id").asc)
      .limit(1)
  }

  /** Scale-path medoid: exact total distance for a centroid-pruned
    * candidate set. The medoid of a point set lies near its centroid (for
    * any metric the total-distance objective is minimized in the dense
    * center), so: (1) one aggregation computes the centroid; (2) the
    * `numCandidates` rows nearest the centroid become candidates
    * (TakeOrdered — no shuffle of the full data); (3) ONE scan computes
    * every row's distance to every broadcast candidate and sums per
    * candidate — exact totals, O(n·C) work, no self-join. Approximation
    * error only if the true medoid is outside the candidate set
    * (multi-modal data); spec bounds this against the exact form.
    */
  def medoidApprox(df: DataFrame, idCol: Column, vecCol: Column,
                   metric: String = "euclidean",
                   numCandidates: Int = 100): DataFrame = {
    val base = df.select(idCol.as("id"), vecCol.cast("array<float>").as("v"))
    val cent = centroidVec(base, col("v"), Nil)
      .collect()(0).getSeq[Float](0).toArray
    val cands = base
      .withColumn("dc", Distances.distance(metric, col("v"), lit(cent)))
      .orderBy(col("dc").asc, col("id").asc).limit(numCandidates)
      .select(col("id").as("cand_id"), col("v").as("cand_v"))
    base.crossJoin(broadcast(cands))
      .filter(col("id") =!= col("cand_id"))
      .withColumn("d", Distances.distance(metric, col("cand_v"), col("v")))
      .groupBy(col("cand_id").as("id"))
      .agg(sum(col("d")).as("total_dist"))
      .orderBy(round(col("total_dist"), 4).asc, col("id").asc)
      .limit(1)
  }

  /** Distance of every row to its group centroid: input df + `distance`. */
  def distToCentroid(df: DataFrame, vecCol: Column, groupCols: Seq[String],
                     metric: String = "euclidean"): DataFrame = {
    val cents = centroidVec(df, vecCol, groupCols.map(col))
    val joined =
      if (groupCols.nonEmpty) df.join(broadcast(cents), groupCols)
      else df.crossJoin(broadcast(cents))
    joined.withColumn("distance",
      Distances.distance(metric, vecCol, col("centroid"))).drop("centroid")
  }

  /** Spread = mean squared distance to centroid (+ its sqrt), per group. */
  def spread(df: DataFrame, vecCol: Column, groupCols: Seq[String],
             metric: String = "euclidean"): DataFrame = {
    val d = distToCentroid(df, vecCol, groupCols, metric)
    val g = if (groupCols.nonEmpty) d.groupBy(groupCols.map(col): _*)
            else d.groupBy()
    g.agg(avg(col("distance") * col("distance")).as("spread"))
      .withColumn("std_dev", sqrt(col("spread")))
  }

  /** Outliers: rows with z-score of distance-to-centroid > threshold
    * (population std; empty result when std < 1e-10 or n ≤ 2).
    */
  def outliers(df: DataFrame, idCol: Column, vecCol: Column,
               threshold: Double, groupCols: Seq[String] = Nil,
               metric: String = "euclidean"): DataFrame = {
    val d = distToCentroid(df, vecCol, groupCols, metric)
      .select((groupCols.map(col) :+ idCol.as("id") :+ col("distance")): _*)
    val statsG = if (groupCols.nonEmpty) d.groupBy(groupCols.map(col): _*)
                 else d.groupBy()
    val stats = statsG.agg(
      avg(col("distance")).as("mean_d"),
      // population variance, like the reference (not Spark's sample var_samp)
      (avg(col("distance") * col("distance")) -
        avg(col("distance")) * avg(col("distance"))).as("var_d"),
      count(lit(1)).as("n_"))
    val joined = if (groupCols.nonEmpty) d.join(broadcast(stats), groupCols)
                 else d.crossJoin(broadcast(stats))
    joined
      .withColumn("std_d", sqrt(greatest(col("var_d"), lit(0.0))))
      .filter(col("n_") > 2 && col("std_d") >= 1e-10)
      .withColumn("z_score", (col("distance") - col("mean_d")) / col("std_d"))
      .filter(col("z_score") > threshold)
      .select((groupCols.map(col) :+ col("id") :+ col("distance") :+ col("z_score")): _*)
  }

  /** Distance-to-centroid histogram (reference: vector_aggregation.rs:
    * 296-370): `bins` equal-width bins over [min, max], top edge clamped
    * into the last bin; width 1.0 when max≈min.
    */
  def distribution(df: DataFrame, vecCol: Column, bins: Int,
                   groupCols: Seq[String] = Nil,
                   metric: String = "euclidean"): DataFrame = {
    val d = distToCentroid(df, vecCol, groupCols, metric)
    val statsG = if (groupCols.nonEmpty) d.groupBy(groupCols.map(col): _*)
                 else d.groupBy()
    val stats = statsG.agg(min(col("distance")).as("min_d"),
      max(col("distance")).as("max_d"))
    val joined = if (groupCols.nonEmpty) d.join(broadcast(stats), groupCols)
                 else d.crossJoin(broadcast(stats))
    joined
      .withColumn("width",
        when(abs(col("max_d") - col("min_d")) < 1e-10, 1.0)
          .otherwise((col("max_d") - col("min_d")) / bins))
      .withColumn("bin",
        least(floor((col("distance") - col("min_d")) / col("width")), lit(bins - 1))
          .cast("int"))
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("bin_count"))
  }

  /** KMeans clustering (reference Cluster{k} op, 50 iterations:
    * vector_aggregation.rs:186-295) — centroids fit driver-locally on a
    * bounded sample (an MLlib fit is ~2 jobs per iteration; the sample-fit
    * is the standard recipe at any scale), assignment distributed via the
    * same nearest-centroid expression the IVF index uses.
    */
  def cluster(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
              maxIter: Int = 50, seed: Long = 42L,
              maxTrainRows: Int = 100000): DataFrame =
    clusterTrace(df, idCol, vecCol, k, maxIter, seed, maxTrainRows)._1

  /** [[cluster]] plus the Lloyd WCSS-per-iteration trace, which must be
    * non-increasing (the `vec_cluster` gate's quantitative invariant).
    */
  def clusterTrace(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
                   maxIter: Int = 50, seed: Long = 42L,
                   maxTrainRows: Int = 100000): (DataFrame, Array[Double]) = {
    val train = graft.ann.Ivf.boundedSample(
      df.select(vecCol.cast("array<float>").as("v")), maxTrainRows, seed)
      .collect().map(_.getSeq[Float](0).toArray)
    val (centroids, wcss) =
      graft.ann.Ivf.localKMeansTrace(train, k, maxIter, seed)
    (df.select(idCol.as("id"),
      graft.ann.Ivf.cellOf(vecCol, centroids, "euclidean").as("cluster")),
      wcss)
  }
}
