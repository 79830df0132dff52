package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (SURVEY.md §2.4; reference:
  * src/hybrid.rs:540-600):
  *
  *   rrf_score(d) = Σᵢ weightᵢ / (k + rankᵢ(d))     (1-based ranks)
  *
  * defaults k=60, weights 0.5/0.5; presets `semantic` 0.7/0.3 and `keyword`
  * 0.3/0.7 (reference: src/hybrid.rs:109-126). The vector leg also reports
  * similarity `1/(1+distance)` (reference: src/hybrid.rs:551).
  *
  * Inputs are *bounded* ranked result lists (top-N each), so the unpartitioned
  * row_number windows and the outer join touch ≤ 2N rows regardless of corpus
  * size — fusion cost is independent of data scale.
  */
object Rrf {

  final case class Config(k: Double = 60.0, vectorWeight: Double = 0.5,
                          bm25Weight: Double = 0.5)
  object Config {
    val default: Config = Config()
    val semantic: Config = Config(vectorWeight = 0.7, bm25Weight = 0.3)
    val keyword: Config = Config(vectorWeight = 0.3, bm25Weight = 0.7)
  }

  /** Fuse a vector result (id, distance — ascending better) with a BM25
    * result (id, score — descending better). Rank ties break by id so the
    * fusion is deterministic across partitionings. Both legs carry the
    * static candidate-list guard (graft.internal.Guards.requireKBounded) —
    * a frame statically bigger than the global-window bound is rejected
    * at plan time.
    */
  def fuse(vector: DataFrame, bm25: DataFrame,
           config: Config = Config.default,
           limit: Int = 10, idCol: String = "id",
           distanceCol: String = "distance",
           scoreCol: String = "score"): DataFrame = {
    graft.internal.Guards.requireKBounded(vector, "Rrf.fuse(vector)")
    graft.internal.Guards.requireKBounded(bm25, "Rrf.fuse(bm25)")
    val vRanked = vector.select(
      col(idCol).as("id"),
      col(distanceCol).as("__dist"),
      row_number().over(
        Window.orderBy(col(distanceCol).asc, col(idCol).asc)).as("vector_rank"))
    val bRanked = bm25.select(
      col(idCol).as("id"),
      col(scoreCol).as("bm25_score"),
      row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol).asc)).as("bm25_rank"))
    vRanked.join(bRanked, Seq("id"), "full_outer")
      .select(
        col("id"),
        (coalesce(lit(config.vectorWeight) / (lit(config.k) + col("vector_rank")), lit(0.0)) +
          coalesce(lit(config.bm25Weight) / (lit(config.k) + col("bm25_rank")), lit(0.0)))
          .as("rrf_score"),
        (lit(1.0) / (lit(1.0) + col("__dist"))).as("vector_score"),
        col("bm25_score"), col("vector_rank"), col("bm25_rank"))
      .orderBy(col("rrf_score").desc, col("id").asc)
      .limit(limit)
  }
}
