package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Cross-modal search over per-modality collections (SURVEY.md §2.3;
  * reference: src/indexing/multimodal_search.rs — modality registry,
  * projection-matrix query alignment, per-modality top-k, list fusion).
  *
  * Differs from [[MultimodalFusion]] (one document carrying several
  * vectors, one fused score): here each modality is its OWN collection
  * (text table, image table, …); a query searches several, optionally
  * projecting the query vector between embedding spaces, and the ranked
  * LISTS are fused (round-robin / score-sort / RRF —
  * multimodal_search.rs:251-263, 470-525). Scores are weighted cosine
  * SIMILARITY, descending (multimodal_search.rs:440-452).
  *
  * Spark shape: per-modality kNN (TakeOrderedAndProject over each table) →
  * union of the k-bounded lists → fusion as DataFrame algebra (orderBy /
  * groupBy-agg) — one lazy plan end-to-end, never wider than
  * Σ per-modality k, no driver detour.
  */
object CrossModal {

  final case class Modality(name: String, df: DataFrame, dims: Int,
                            idCol: String = "id", vecCol: String = "vector",
                            embeddingSpace: String = "default")

  /** Row-major target×source linear map (multimodal_search.rs:277-315). */
  final case class Projection(data: Array[Float], sourceDim: Int, targetDim: Int) {
    require(data.length == sourceDim * targetDim,
      s"Projection matrix size mismatch: expected ${targetDim}x$sourceDim")
    def apply(v: Array[Float]): Array[Float] = {
      require(v.length == sourceDim, s"expected $sourceDim dims, got ${v.length}")
      val out = new Array[Float](targetDim)
      var i = 0
      while (i < targetDim) {
        var s = 0.0f; var j = 0
        while (j < sourceDim) { s += v(j) * data(i * sourceDim + j); j += 1 }
        out(i) = s; i += 1
      }
      out
    }
  }

  sealed trait Fusion
  object Fusion {
    case object RoundRobin extends Fusion
    case object ScoreSort extends Fusion
    final case class Rrf(k: Double = 60.0) extends Fusion
  }

  final class Engine(modalities: Seq[Modality],
                     weights: Map[String, Double] = Map.empty,
                     perModalityK: Int = 10,
                     fusion: Fusion = Fusion.RoundRobin) {
    private val byName = modalities.map(m => m.name -> m).toMap
    private val projections =
      scala.collection.mutable.HashMap[(String, String), Projection]()

    def registerProjection(from: String, to: String, p: Projection): Unit = {
      val f = byName.getOrElse(from, throw new NoSuchElementException(s"Modality '$from'"))
      val t = byName.getOrElse(to, throw new NoSuchElementException(s"Modality '$to'"))
      require(p.sourceDim == f.dims && p.targetDim == t.dims,
        s"Projection dims (${p.sourceDim}->${p.targetDim}) don't match modality dims (${f.dims} -> ${t.dims})")
      projections((from, to)) = p
    }

    /** Project the query between spaces when a projection is registered;
      * identity otherwise.
      */
    def projectQuery(query: Array[Float], from: String, to: String): Array[Float] =
      projections.get((from, to)).map(_(query)).getOrElse(query)

    /** Search the named modalities; `queryModality` (if set) drives
      * projection of the query vector into each target space. Returns
      * (id, modality, score) rows, fused and truncated to k.
      *
      * Fusion is pure DataFrame algebra over the union of the k-bounded
      * per-modality top-k frames — round-robin is an orderBy on
      * (rank, list index), RRF a groupBy(id) aggregate — so the result
      * stays a lazy plan and composes with downstream operators instead
      * of detouring through the driver.
      */
    def search(spark: SparkSession, query: Array[Float],
               modalityNames: Seq[String], k: Int,
               queryModality: Option[String] = None): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val perList: Seq[DataFrame] = modalityNames.zipWithIndex.map {
        case (name, listIdx) =>
          val m = byName.getOrElse(name,
            throw new NoSuchElementException(s"Modality '$name'"))
          val w = weights.getOrElse(name, 1.0)
          val q = queryModality.filter(_ != name)
            .map(from => projectQuery(query, from, name)).getOrElse(query)
          // weighted cosine similarity, DESCENDING (multimodal_search
          // .rs:440); dims mismatch with no projection → truncated dot
          // like the reference's min_len cosine
          val qv = if (q.length == m.dims) q else q.take(m.dims).padTo(m.dims, 0.0f)
          val topk = m.df
            .select(col(m.idCol).cast("string").as("id"),
              ((lit(1.0) - Distances.cosine(col(m.vecCol), lit(qv))) * w).as("score"))
            .orderBy(col("score").desc, col("id").asc)
            .limit(perModalityK)
          // the global window runs over a k-bounded frame (post-limit),
          // so the single-partition sort is k rows, not the table
          topk
            .withColumn("modality", lit(name))
            .withColumn("__list", lit(listIdx))
            .withColumn("__rank", row_number().over(
              Window.orderBy(col("score").desc, col("id").asc)))
      }
      val all = perList.reduce(_ unionByName _)
      val fused = fusion match {
        case Fusion.ScoreSort =>
          all.orderBy(col("score").desc, col("id").asc)
        case Fusion.RoundRobin =>
          // i-th element of each list, lists in declaration order —
          // exactly the reference's interleave (multimodal_search.rs:470)
          all.orderBy(col("__rank").asc, col("__list").asc)
        case Fusion.Rrf(rrfK) =>
          // 1/(k + rank), rank 1-based; the reported modality is the
          // FIRST list containing the id (min list index), like the
          // reference's first-seen map
          all.groupBy(col("id"))
            .agg(sum(lit(1.0) / (lit(rrfK) + col("__rank"))).as("score"),
              min(struct(col("__list"), col("modality")))
                .getField("modality").as("modality"))
            .orderBy(col("score").desc, col("id").asc)
      }
      fused.select(col("id"), col("modality"), col("score")).limit(k)
    }
  }
}
