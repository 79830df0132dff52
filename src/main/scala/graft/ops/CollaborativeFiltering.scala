package graft.ops

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Embedded collaborative filtering (reference:
  * src/experimental/collaborative_filtering.rs — interaction weights
  * :42-52, ALS train :222-356, recommend :357-424, hybrid :425-470,
  * session :471-540).
  *
  * Spark-first: the interaction matrix is a DataFrame and the ALS
  * factorization is MLlib's distributed implicit-feedback solver — the
  * exact algorithm the reference hand-rolls single-node (its train() is a
  * sequential ALS sweep), already block-partitioned for cluster scale.
  * String ids are dense-indexed with window-free monotonic joins, factor
  * tables stay DataFrames, and the hybrid/session scorers are joins over
  * the k-bounded factor frames.
  */
object CollaborativeFiltering {

  /** Interaction-type confidence weights (collaborative_filtering.rs:42). */
  def interactionWeight(typeCol: Column, ratingCol: Column): Column =
    when(typeCol === "click", 1.0)
      .when(typeCol === "purchase", 5.0)
      .when(typeCol === "rating", ratingCol.cast("double"))
      .when(typeCol === "search_result", 0.5)
      .otherwise(coalesce(ratingCol.cast("double"), lit(1.0)))

  final case class Model(
      userFactors: DataFrame, // user (string), features ARRAY<FLOAT>
      itemFactors: DataFrame, // item (string), features ARRAY<FLOAT>
      rank: Int)

  /** Dense 0-based integer ids for the distinct values of `keyCol`,
    * assigned in `keyCol` sort order — row-identical to
    * `row_number().over(Window.orderBy(keyCol)) - 1` (the oracle form
    * CollaborativeFilteringSpec pins) but computed by
    * [[DistributedRank.rankedByRange]]'s global-rank fast path, so no
    * single-partition sort exists anywhere in the plan. Returns the
    * mapping plus a release thunk (rankedByRange's pin — an EXPLICIT
    * unpersist, no checkpoint left to the GC): callers must finish (or
    * cache) every consumption of the mapping before invoking release.
    * ALS ids must fit in Int; the count over the pinned partitions is a
    * cheap assertion of that ceiling (~2.1e9 — ALS's own id-space
    * bound, not a numbering limit).
    */
  private[graft] def denseIndex(base: DataFrame, keyCol: String,
                                outCol: String): (DataFrame, () => Unit) = {
    val (ranked, release) = DistributedRank.rankedByRange(
      base, Nil, Seq(col(keyCol)), "__r", "__n")
    try {
      val out = ranked.withColumn(outCol, col("__r").cast("int"))
        .drop("__r", "__n")
      val n = out.count() // one job over the pinned range partitions
      require(n <= Int.MaxValue,
        s"denseIndex: $n distinct '$keyCol' values exceed ALS's Int id space")
      (out, release)
    } catch {
      // the count job or the Int-space assertion can throw before the
      // caller ever sees the release thunk — release here, else the pin
      // leaks on exactly the failure paths this API exists to cover
      case t: Throwable => release(); throw t
    }
  }

  /** Fit implicit-feedback ALS over (user, item, weight) interactions;
    * repeated interactions are weight-summed (the reference accumulates
    * confidence per pair). Dense ALS ids come from the distributed global
    * rank ([[denseIndex]]); the factorization is MLlib's
    * block-partitioned solver — no single-partition stage anywhere. All
    * three pinned intermediates (the interaction aggregate and the two
    * id mappings) are released in finally, on failure paths included.
    */
  def fit(interactions: DataFrame, userCol: String, itemCol: String,
          weightCol: String, rank: Int = 16, regParam: Double = 0.1,
          maxIter: Int = 10, seed: Long = 42L): Model = {
    val agg = interactions.groupBy(col(userCol), col(itemCol))
      .agg(sum(col(weightCol)).as("weight"))
      .persist()
    var releaseIds: List[() => Unit] = Nil
    try {
      val (users, uRel) = denseIndex(
        agg.select(col(userCol).cast("string").as("u")).distinct(), "u", "uid")
      releaseIds ::= uRel
      val (items, iRel) = denseIndex(
        agg.select(col(itemCol).cast("string").as("it")).distinct(), "it", "iid")
      releaseIds ::= iRel
      val ratings = agg
        .join(users, agg(userCol).cast("string") === users("u"))
        .join(items, agg(itemCol).cast("string") === items("it"))
        .select(col("uid"), col("iid"), col("weight").cast("float").as("w"))
      val model = new ALS()
        .setImplicitPrefs(true)
        .setRank(rank).setRegParam(regParam).setMaxIter(maxIter)
        .setSeed(seed)
        .setUserCol("uid").setItemCol("iid").setRatingCol("w")
        .fit(ratings)
      val uf = model.userFactors
        .join(users, col("id") === col("uid"))
        .select(col("u").as("user"), col("features"))
      val itf = model.itemFactors
        .join(items, col("id") === col("iid"))
        .select(col("it").as("item"), col("features"))
      val out = Model(uf.cache(), itf.cache(), rank)
      out.userFactors.count(); out.itemFactors.count() // pin before release
      out
    } finally {
      releaseIds.foreach(r => r())
      agg.unpersist()
    }
  }

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d),
      (acc, x) => acc + x)

  /** Top-k items for a user by factor dot product, excluding `seen` item
    * ids (the reference excludes interacted items).
    */
  def recommend(m: Model, userId: String, k: Int,
                seen: Seq[String] = Nil): DataFrame = {
    val u = m.userFactors.filter(col("user") === userId)
      .select(col("features").as("uf"))
    val base = m.itemFactors.crossJoin(broadcast(u))
      .withColumn("cf_score", dot(col("features"), col("uf")))
      .select(col("item"), col("cf_score"))
    (if (seen.nonEmpty) base.filter(!col("item").isin(seen: _*)) else base)
      .orderBy(col("cf_score").desc, col("item").asc)
      .limit(k)
  }

  /** Hybrid: α·cf + (1−α)·(1 − cosine(itemVec, queryVec)) — CF blended
    * with content similarity (collaborative_filtering.rs:425-470).
    */
  def recommendHybrid(m: Model, userId: String, itemVectors: DataFrame,
                      itemIdCol: String, vecCol: String,
                      queryVec: Array[Float], k: Int,
                      alpha: Double = 0.5): DataFrame = {
    val cf = recommend(m, userId, k = Int.MaxValue)
    cf.join(itemVectors.select(col(itemIdCol).cast("string").as("item"),
        col(vecCol).as("__v")), "item")
      .withColumn("sim", lit(1.0) - Distances.cosine(col("__v"), lit(queryVec)))
      .withColumn("score", lit(alpha) * col("cf_score") +
        lit(1.0 - alpha) * col("sim"))
      .select(col("item"), col("cf_score"), col("sim"), col("score"))
      .orderBy(col("score").desc, col("item").asc)
      .limit(k)
  }

  /** Session-based: centroid of the recent items' factors → nearest other
    * items (collaborative_filtering.rs:471-540).
    */
  def recommendSession(m: Model, recentItems: Seq[String], k: Int): DataFrame = {
    val centroid = m.itemFactors.filter(col("item").isin(recentItems: _*))
      .agg(array((0 until m.rank).map(i =>
        avg(element_at(col("features"), i + 1))): _*).as("c"))
    m.itemFactors.crossJoin(broadcast(centroid))
      .filter(!col("item").isin(recentItems: _*))
      .withColumn("score", dot(col("features"), col("c")))
      .select(col("item"), col("score"))
      .orderBy(col("score").desc, col("item").asc)
      .limit(k)
  }
}
