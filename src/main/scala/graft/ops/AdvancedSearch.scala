package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Sparse-vector search (SURVEY.md §2.3; reference: src/indexing/sparse.rs).
  *
  * A sparse vector is the exploded posting layout `(id, idx, value)` — the
  * distributed form of the reference's inverted index: scoring a query
  * touches only the postings of the query's non-zero dimensions (broadcast
  * join on a handful of idx keys), then one groupBy over candidate ids.
  * Docs sharing no dimension with the query never appear (the reference's
  * HashMap-accumulator semantics).
  */
object Sparse {

  /** Posting-list form of a struct column (indices ARRAY<INT>, values
    * ARRAY<FLOAT>) — or build it directly from a dense vector by dropping
    * near-zeros.
    */
  def postings(df: DataFrame, idCol: Column, indicesCol: Column,
               valuesCol: Column): DataFrame =
    df.select(idCol.as("id"),
        explode(arrays_zip(indicesCol.as("idx"), valuesCol.as("value"))).as("p"))
      .select(col("id"), col("p.idx").as("idx"), col("p.value").as("value"))

  /** Sparsify a dense ARRAY<FLOAT>: keep dims with |x| > eps. */
  def sparsify(df: DataFrame, idCol: Column, vecCol: Column,
               eps: Double): DataFrame =
    df.select(idCol.as("id"), posexplode(vecCol).as(Seq("idx", "value")))
      .filter(abs(col("value")) > eps)

  /** Dot-product top-k (reference: sparse.rs:511-560): descending score,
    * only docs overlapping the query.
    */
  def searchDot(postings: DataFrame, query: Seq[(Int, Float)], k: Int): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val q = query.toDF("idx", "qval")
    postings.join(broadcast(q), "idx")
      .groupBy(col("id"))
      .agg(sum(col("value").cast("double") * col("qval").cast("double")).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Cosine top-k (reference: sparse.rs:555-610): dot normalized by both
    * norms; zero-norm docs score 0.
    */
  def searchCosine(postings: DataFrame, query: Seq[(Int, Float)], k: Int): DataFrame = {
    val qNorm = math.sqrt(query.map(v => v._2.toDouble * v._2).sum)
    if (qNorm == 0.0) return postings.sparkSession.emptyDataFrame
    val norms = postings.groupBy(col("id"))
      .agg(sqrt(sum(col("value").cast("double") * col("value").cast("double"))).as("norm"))
    searchDotAll(postings, query)
      .join(norms, "id")
      .withColumn("score",
        when(col("norm") > 0, col("dot") / (col("norm") * qNorm)).otherwise(0.0))
      .select(col("id"), col("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Threshold search (reference: sparse.rs:613+): score >= minScore. */
  def searchWithThreshold(postings: DataFrame, query: Seq[(Int, Float)],
                          k: Int, minScore: Double): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val q = query.toDF("idx", "qval")
    postings.join(broadcast(q), "idx")
      .groupBy(col("id"))
      .agg(sum(col("value").cast("double") * col("qval").cast("double")).as("score"))
      .filter(col("score") >= minScore)
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  private def searchDotAll(postings: DataFrame, query: Seq[(Int, Float)]): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val q = query.toDF("idx", "qval")
    postings.join(broadcast(q), "idx")
      .groupBy(col("id"))
      .agg(sum(col("value").cast("double") * col("qval").cast("double")).as("dot"))
  }
}

/** MaxSim / ColBERT-style multi-vector search (SURVEY.md §2.3; reference:
  * src/indexing/multivec.rs:206-331).
  *
  * Documents live in the exploded child-table layout `(doc_id, vector)` —
  * one row per token embedding, the scalable form of `Vec<Vec<f32>>`.
  * `score(Q,D) = Σ_{q∈Q} max_{d∈D} sim(q,d)` with the reference's
  * similarity mapping: cosine → 1−dist, dot → −dist, else 1/(1+dist).
  */
object MultiVec {

  def sim(metric: String, a: Column, b: Column): Column = {
    val d = Distances.distance(metric, a, b)
    metric match {
      case "cosine" => lit(1.0) - d
      case "dot"    => -d
      case _        => lit(1.0) / (lit(1.0) + d)
    }
  }

  /** Exact MaxSim top-k. `queryTokens` is a small DF (qtok_id, qvec) that is
    * broadcast; the per-(doc, qtok) max and per-doc sum are partial
    * aggregates, so the shuffle carries doc_id keys only.
    */
  def maxSim(docTokens: DataFrame, queryTokens: DataFrame, k: Int,
             metric: String = "cosine", docIdCol: String = "doc_id",
             vecCol: String = "vector", qIdCol: String = "qtok_id",
             qVecCol: String = "qvec"): DataFrame =
    docTokens.crossJoin(broadcast(queryTokens))
      .withColumn("sim", sim(metric, col(vecCol), col(qVecCol)))
      .groupBy(col(docIdCol), col(qIdCol))
      .agg(max(col("sim")).as("max_sim"))
      .groupBy(col(docIdCol))
      .agg(sum(col("max_sim")).as("score"))
      .orderBy(col("score").desc, col(docIdCol).asc)
      .limit(k)

  /** Two-stage MaxSim (reference: multivec.rs:275-331): rank docs by
    * centroid similarity to the query centroid, keep k×multiplier, exact
    * MaxSim re-rank. Centroids are precomputable and tiny.
    */
  def maxSimTwoStage(docTokens: DataFrame, queryTokens: DataFrame, k: Int,
                     candidateMultiplier: Int = 4, metric: String = "cosine",
                     docIdCol: String = "doc_id", vecCol: String = "vector",
                     qVecCol: String = "qvec"): DataFrame = {
    import graft.functions.VectorAgg
    val docCentroids = docTokens.groupBy(col(docIdCol))
      .agg(VectorAgg.centroidF(col(vecCol)).as("centroid"))
    val qCentroid = queryTokens.agg(VectorAgg.centroidF(col(qVecCol)).as("qc"))
    val cands = docCentroids.crossJoin(broadcast(qCentroid))
      .withColumn("csim", sim(metric, col("centroid"), col("qc")))
      .orderBy(col("csim").desc, col(docIdCol).asc)
      .limit(k * candidateMultiplier)
      .select(col(docIdCol))
    maxSim(docTokens.join(broadcast(cands), docIdCol), queryTokens, k,
      metric, docIdCol, vecCol)
  }
}

/** Cross-collection search (SURVEY.md §2.3; reference:
  * src/search/cross_collection.rs:209-575): per-collection top-k fan-out,
  * then merge by a ScoreAggregation — each collection's top-k is bounded, so
  * the merge is over ≤ collections×k rows regardless of data size.
  */
object CrossCollection {

  sealed trait Merge
  object Merge {
    case object MinScore extends Merge // dedup by id keeping lowest distance
    case object MaxScore extends Merge
    case object Average extends Merge
    case object Rrf extends Merge      // Σ 1/(60 + rank_in_collection)
  }

  /** `collections` maps name -> (df already scored with `distance`, idCol
    * name). Each input must already be that collection's top-k list.
    */
  def merge(collections: Seq[(String, DataFrame)], k: Int,
            how: Merge = Merge.MinScore, idCol: String = "id",
            rrfK: Double = 60.0): DataFrame = {
    val tagged = collections.map { case (name, df) =>
      graft.internal.Guards.requireKBounded(df, s"CrossCollection.merge($name)")
      df.select(col(idCol).as("id"), col("distance"),
        lit(name).as("collection"),
        row_number().over(
          Window.orderBy(col("distance").asc, col(idCol).asc))
          .as("rank_in_collection"))
    }.reduce(_ unionByName _)
    how match {
      case Merge.MinScore =>
        val w = Window.partitionBy(col("id"))
          .orderBy(col("distance").asc, col("collection").asc)
        tagged.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .orderBy(col("distance").asc, col("id").asc)
          .limit(k)
      case Merge.MaxScore =>
        val w = Window.partitionBy(col("id"))
          .orderBy(col("distance").desc, col("collection").asc)
        tagged.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .orderBy(col("distance").asc, col("id").asc)
          .limit(k)
      case Merge.Average =>
        tagged.groupBy(col("id"))
          .agg(avg(col("distance")).as("distance"),
            count(lit(1)).as("n_collections"))
          .orderBy(col("distance").asc, col("id").asc)
          .limit(k)
      case Merge.Rrf =>
        tagged.groupBy(col("id"))
          .agg(sum(lit(1.0) / (lit(rrfK) + col("rank_in_collection"))).as("rrf_score"))
          .orderBy(col("rrf_score").desc, col("id").asc)
          .limit(k)
    }
  }
}

/** MMR diversification (SURVEY.md §2.5; reference:
  * src/integrations/langchain.rs:802-856): greedy argmax of
  * `λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)` over a bounded candidate
  * pool, cosine similarity, seed = candidate[0]. The loop is inherently
  * sequential, so it runs on the driver over the collected pool (≤ k×10
  * rows by construction) — at any corpus scale the pool is what was already
  * retrieved.
  */
object Mmr {

  private def cosineSim(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** `candidates` must be ordered by relevance (best first). Returns the
    * selected ids in selection order.
    */
  def select(candidates: Seq[(Any, Array[Float])], query: Array[Float],
             k: Int, lambda: Double = 0.7): Seq[Any] = {
    if (candidates.isEmpty || k == 0) return Nil
    val selected = scala.collection.mutable.ArrayBuffer(candidates.head)
    val remaining = scala.collection.mutable.LinkedHashSet(
      candidates.indices.drop(1): _*)
    while (selected.length < k && remaining.nonEmpty) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      for (idx <- remaining) {
        val emb = candidates(idx)._2
        val qSim = cosineSim(query, emb)
        val maxSel = selected.map(s => cosineSim(emb, s._2)).max
        val score = lambda * qSim - (1.0 - lambda) * maxSel
        if (score > bestScore) { bestScore = score; bestIdx = idx }
      }
      if (bestIdx < 0) return selected.map(_._1).toSeq
      selected += candidates(bestIdx)
      remaining -= bestIdx
    }
    selected.map(_._1).toSeq
  }

  /** DataFrame wrapper: collect the (bounded) candidate pool, run the
    * greedy loop, return selection as a DataFrame with selection order.
    */
  def diversify(candidates: DataFrame, idCol: String, vecCol: String,
                query: Array[Float], k: Int, lambda: Double = 0.7): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val pool = candidates.select(col(idCol), col(vecCol).cast("array<float>"))
      .collect()
      .map(r => (r.get(0), r.getSeq[Float](1).toArray))
      .toSeq
    val picked = Mmr.select(pool, query, k, lambda)
    picked.zipWithIndex
      .map { case (id, ord) => (id.toString, ord) }
      .toDF(idCol, "selection_order")
  }
}

/** TF-IDF-weighted term-overlap reranker (SURVEY.md §2.5; reference:
  * src/search/reranker.rs:362-466): smoothed IDF `ln((N+1)/(df+1))+1` over
  * the *candidate set*, score = Σ idf(matched query terms) /
  * (√|doc_terms| · |query_terms|). Query terms count per occurrence;
  * doc terms are a distinct set. Pure whitespace/lowercase tokenization.
  */
object TermOverlap {

  def rerank(docs: DataFrame, query: String, idCol: String = "id",
             textCol: String = "text", topK: Int = 10): DataFrame = {
    val queryTerms = query.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).toSeq
    if (queryTerms.isEmpty) return docs.select(col(idCol), lit(0.0).as("score"))
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queryTerms.groupBy(identity).view.mapValues(_.size).toSeq
      .toDF("term", "qc")
    val docTerms = docs.select(col(idCol).as("id"),
      array_distinct(split(lower(col(textCol)), "\\s+")).as("terms"))
    val n = docs.count().toDouble
    val posting = docTerms.select(col("id"), size(col("terms")).as("doc_len"),
        explode(col("terms")).as("term"))
      .join(broadcast(qt), "term")
    val dfs = posting.groupBy(col("term"))
      .agg(countDistinct(col("id")).as("df"))
    val scored = posting.join(broadcast(dfs), "term")
      .withColumn("idf", log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0)
      .groupBy(col("id"), col("doc_len"))
      .agg(sum(col("idf") * col("qc")).as("idf_sum"))
      .withColumn("score",
        col("idf_sum") / (sqrt(greatest(col("doc_len"), lit(1))) * queryTerms.length))
      .select(col("id"), col("score"))
    // docs with zero overlap score 0 (reference returns them with score 0)
    docs.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .withColumn("score", coalesce(col("score"), lit(0.0)))
      .orderBy(col("score").desc, col("id").asc)
      .limit(topK)
  }
}
