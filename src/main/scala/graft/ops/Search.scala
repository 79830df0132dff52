package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Distances, Metric}

/** Exact similarity-search operator family (SURVEY.md §2.3).
  *
  * The reference's `brute_force_search` (reference:
  * src/collection/search_methods.rs:189-271) is the semantics oracle for all
  * search paths; on Spark an exact top-k is a single scan — `ORDER BY distance
  * LIMIT k` plans as `TakeOrderedAndProject`, i.e. a per-partition bounded
  * heap + driver-side merge of k×partitions rows. That is the distributed
  * analogue of the reference's per-segment binary heap and costs no shuffle
  * of the full table, so it scales linearly with executors at 100 TB.
  *
  * Ties are broken by ascending id so results are deterministic across
  * partitionings (the reference's ordering on equal distances is insertion
  * order, which has no distributed analogue).
  */
object Search {

  /** Add a `distance` column for `metric` between `vecCol` and `query`.
    * `query` is typically a literal array (`lit(Array[Float])`) or a column
    * from a broadcast one-row DataFrame.
    */
  def withDistance(df: DataFrame, vecCol: Column, query: Column,
                   metric: String = "cosine",
                   outCol: String = "distance"): DataFrame =
    df.withColumn(outCol, Distances.distance(metric, vecCol, query))

  /** `search(query, k)` — exact top-k by ascending distance
    * (reference: src/collection/search_methods.rs:53-111).
    */
  def topK(df: DataFrame, vecCol: Column, query: Column, k: Int,
           metric: String = "cosine", idCol: String = "id"): DataFrame =
    withDistance(df, vecCol, query, metric)
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k)

  /** `search_with_filter` (reference: src/collection/search_methods.rs:601).
    * Exact engine: filter then top-k — no over-fetch needed (the reference's
    * ×10 over-fetch is an ANN-recall workaround, SURVEY.md §2.3). The filter
    * is pushed to the scan by Catalyst.
    */
  def topKWithFilter(df: DataFrame, vecCol: Column, query: Column, k: Int,
                     filter: Column, metric: String = "cosine",
                     idCol: String = "id"): DataFrame =
    topK(df.filter(filter), vecCol, query, k, metric, idCol)

  /** `search_radius` — all vectors with distance <= r (inclusive), ascending,
    * capped (reference: src/collection/search_methods.rs:715-760).
    */
  def radius(df: DataFrame, vecCol: Column, query: Column, r: Double,
             limit: Int, metric: String = "cosine",
             idCol: String = "id"): DataFrame =
    withDistance(df, vecCol, query, metric)
      .filter(col("distance") <= r)
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(limit)

  /** `batch_search(queries, k)` → (query_id, id, distance) only
    * (reference: src/collection/batch.rs:32-76). The reference fans out
    * per-query on rayon; here one scan of the vector table serves every
    * query: broadcast cross-join against the (small) query set, then a
    * bounded top-k AGGREGATE per query id ([[graft.functions.TopKAgg]]).
    * Partial aggregation keeps a k-element buffer per (partition, query)
    * on the map side, so the exchange carries |partitions|×|queries|×k
    * pre-reduced rows — NOT the |queries|×|vectors| rows a
    * `row_number() OVER (PARTITION BY query_id)` window would shuffle and
    * sort before its rank filter ever ran. At 100 TB that difference is
    * the whole cost of the operator.
    *
    * `idCol` must be numeric (the bounded buffer carries longs); use
    * [[batchTopKRows]] for full payload rows.
    */
  def batchTopKPairs(vectors: DataFrame, queries: DataFrame, k: Int,
                     vecCol: String = "vector", qVecCol: String = "query_vector",
                     qIdCol: String = "query_id", metric: String = "cosine",
                     idCol: String = "id",
                     roundTo: Option[Int] = None): DataFrame = {
    import graft.functions.TopKAgg
    val rawDist = Distances.distance(metric, col(vecCol), col(qVecCol))
    val dist = roundTo.fold(rawDist)(d => round(rawDist, d))
    vectors.crossJoin(broadcast(queries))
      .select(col(qIdCol), dist.as("__d"), col(idCol).cast("long").as("__id"))
      .groupBy(col(qIdCol))
      .agg(TopKAgg.topKF(k)(col("__d"), col("__id")).as("__top"))
      .select(col(qIdCol), explode(col("__top")).as("__t"))
      .select(col(qIdCol), col("__t._2").as(idCol), col("__t._1").as("distance"))
  }

  /** `batch_search` with full payload rows: bounded top-k aggregate first
    * (see [[batchTopKPairs]]), then the |queries|×k winner set — tiny —
    * broadcast-joins back to the vector table for the remaining columns.
    * Two scans of the big table, zero unbounded shuffles.
    */
  def batchTopKRows(vectors: DataFrame, queries: DataFrame, k: Int,
                    vecCol: String = "vector", qVecCol: String = "query_vector",
                    qIdCol: String = "query_id", metric: String = "cosine",
                    idCol: String = "id"): DataFrame = {
    val winners = batchTopKPairs(vectors, queries, k, vecCol, qVecCol,
      qIdCol, metric, idCol)
    vectors.withColumn(idCol, col(idCol).cast("long"))
      .join(broadcast(winners), idCol)
  }

  /** Window formulation of batch top-k — kept for NON-NUMERIC id columns,
    * where the bounded-buffer aggregate does not apply. Shuffles every
    * scored row; prefer [[batchTopKPairs]]/[[batchTopKRows]] whenever ids
    * are numeric.
    */
  def batchTopK(vectors: DataFrame, queries: DataFrame, k: Int,
                vecCol: String = "vector", qVecCol: String = "query_vector",
                qIdCol: String = "query_id", metric: String = "cosine",
                idCol: String = "id"): DataFrame = {
    val joined = vectors.crossJoin(broadcast(queries))
      .withColumn("distance", Distances.distance(metric, col(vecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("distance").asc, col(idCol).asc)
    joined.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank", qVecCol)
  }

  /** `recommend(positive_ids, negative_ids, k)` (reference:
    * src/server/handlers/search.rs:1062-1150): query = mean(positives) −
    * mean(negatives), then plain top-k. The aggregate runs distributed; the
    * resulting 1-row query vector is broadcast back over the scan.
    */
  def recommend(df: DataFrame, vecCol: Column, idCol: Column,
                positiveIds: Seq[Any], negativeIds: Seq[Any], k: Int,
                metric: String = "cosine",
                excludeSeeds: Boolean = true): DataFrame = {
    import graft.functions.VectorAgg
    val pos = df.filter(idCol.isin(positiveIds: _*))
      .agg(VectorAgg.centroidF(vecCol).as("p")).select(col("p"))
    val qdf =
      if (negativeIds.isEmpty) pos.select(col("p").as("qv"))
      else {
        val neg = df.filter(idCol.isin(negativeIds: _*))
          .agg(VectorAgg.centroidF(vecCol).as("n")).select(col("n"))
        pos.crossJoin(neg).select(
          zip_with(col("p"), col("n"), (a, b) => a - b).cast("array<float>").as("qv"))
      }
    val base = if (excludeSeeds)
      df.filter(!idCol.isin((positiveIds ++ negativeIds): _*)) else df
    base.crossJoin(broadcast(qdf))
      .withColumn("distance", Distances.distance(metric, vecCol, col("qv")))
      .drop("qv")
      .orderBy(col("distance").asc, idCol.asc)
      .limit(k)
  }

  /** Score normalization (reference: src/collection/search.rs:93-156).
    * MinMax: best (lowest distance) -> 1.0, worst -> 0.0; all-equal -> 1.0.
    * InverseDistance: `1/(1+d)`.
    */
  def normalizeMinMax(results: DataFrame,
                      distCol: String = "distance",
                      outCol: String = "score"): DataFrame = {
    val w = Window.partitionBy()  // result sets are small (k rows)
    val mn = min(col(distCol)).over(w)
    val mx = max(col(distCol)).over(w)
    results.withColumn(outCol,
      when(mx === mn, lit(1.0)).otherwise((mx - col(distCol)) / (mx - mn)))
  }

  def normalizeInverseDistance(results: DataFrame,
                               distCol: String = "distance",
                               outCol: String = "score"): DataFrame =
    results.withColumn(outCol, lit(1.0) / (lit(1.0) + col(distCol)))

  /** `search_matryoshka(query, k, coarse_dims, oversample)` (reference:
    * src/collection/search_methods.rs:127-180): coarse top-(k×max(oversample,2))
    * on prefix-truncated vectors, then exact full-dim re-rank of that small
    * candidate set. At scale the coarse pass reads fewer bytes per row (slice
    * of the array) and the re-rank touches only k×oversample rows.
    */
  def matryoshka(df: DataFrame, vecCol: Column, query: Column, k: Int,
                 coarseDims: Int, oversample: Int = 2,
                 metric: String = "cosine", idCol: String = "id"): DataFrame = {
    val fetch = k * math.max(oversample, 2)
    val coarse = df
      .withColumn("__coarse_dist", Distances.distance(metric,
        slice(vecCol, 1, coarseDims), slice(query, 1, coarseDims)))
      .orderBy(col("__coarse_dist").asc, col(idCol).asc)
      .limit(fetch)
    coarse
      .withColumn("distance", Distances.distance(metric, vecCol, query))
      .drop("__coarse_dist")
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k)
  }

  /** Keyset pagination (`search_after`, reference: src/server/types.rs:216).
    * Strictly-after (cursorDistance, cursorId) in (distance, id) order.
    */
  def searchAfter(df: DataFrame, vecCol: Column, query: Column, k: Int,
                  cursorDistance: Double, cursorId: Any,
                  metric: String = "cosine", idCol: String = "id",
                  roundTo: Option[Int] = None): DataFrame = {
    // roundTo (the Ivf.search precedent): a caller paging on ROUNDED
    // distances must filter and sort on the same rounding, or rows whose
    // raw distance straddles the cursor's rounded value paginate
    // differently than they sorted
    val base = withDistance(df, vecCol, query, metric)
    val scored = roundTo.fold(base)(n =>
      base.withColumn("distance", round(col("distance"), n)))
    scored
      .filter(col("distance") > cursorDistance ||
        (col("distance") === cursorDistance && col(idCol) > lit(cursorId)))
      .orderBy(col("distance").asc, col(idCol).asc)
      .limit(k)
  }
}
