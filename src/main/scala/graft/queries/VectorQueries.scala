package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Distances
import graft.ops.Search

/** Declared similarity-search queries over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY&lt;FLOAT&gt;, label INT).
  *
  * Every query derives its query vector(s) from the table itself (e.g. the
  * embedding of vec_id 0) so the DuckDB oracle can reproduce it exactly from
  * the same parquet — no out-of-band literals. Distances are rounded to 6
  * decimals on BOTH sides before ordering/output so double-vs-double
  * accumulation-order differences cannot flip the comparison hash.
  */
object VectorQueries {

  /** One-row DF holding the query vector = embedding of `vecId`. */
  private def queryVec(s: SparkSession, dir: String, vecId: Long): DataFrame =
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") === vecId).select(col("embedding").as("qv"))

  private def knn(metric: String, duckExpr: String): Q = Q(
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, round($duckExpr, 6) AS distance
       |FROM embeddings, q
       |ORDER BY distance, vec_id LIMIT 10""".stripMargin
  ) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings")
    emb.crossJoin(broadcast(queryVec(s, dir, 0)))
      .select(col("vec_id"),
        round(Distances.distance(metric, col("embedding"), col("qv")), 6)
          .as("distance"))
      .orderBy(col("distance").asc, col("vec_id").asc)
      .limit(10)
  }

  /** Element-wise oracle via DuckDB's zipping unnest (one row per dim). */
  private def knnElementwise(metric: String, aggExpr: String): Q = Q(
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |pairs AS (
       |  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
       |  FROM embeddings e, q
       |)
       |SELECT vec_id, round($aggExpr, 6) AS distance
       |FROM pairs GROUP BY vec_id
       |ORDER BY distance, vec_id LIMIT 10""".stripMargin
  ) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings")
    emb.crossJoin(broadcast(queryVec(s, dir, 0)))
      .select(col("vec_id"),
        round(Distances.distance(metric, col("embedding"), col("qv")), 6)
          .as("distance"))
      .orderBy(col("distance").asc, col("vec_id").asc)
      .limit(10)
  }

  val defs: Map[String, Q] = Map(
    "knn_cosine" -> knn("cosine",
      "1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[])"),
    "knn_euclidean" -> knn("euclidean",
      "list_distance(embedding::DOUBLE[], qv::DOUBLE[])"),
    "knn_dot" -> knn("dot",
      "-list_dot_product(embedding::DOUBLE[], qv::DOUBLE[])"),
    "knn_manhattan" -> knnElementwise("manhattan", "sum(abs(x - y))"),
    "knn_chebyshev" -> knnElementwise("chebyshev", "max(abs(x - y))"),
    "knn_hamming" -> knnElementwise("hamming",
      "sum(CASE WHEN (x <> 0) <> (y <> 0) THEN 1 ELSE 0 END)"),

    // search_radius: all vectors within r, ascending, capped
    // (reference: src/collection/search_methods.rs:715-760)
    "radius_cosine" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |FROM embeddings, q
        |WHERE round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) <= 0.95
        |ORDER BY distance, vec_id LIMIT 100""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      emb.crossJoin(broadcast(queryVec(s, dir, 0)))
        .select(col("vec_id"),
          round(Distances.cosine(col("embedding"), col("qv")), 6).as("distance"))
        .filter(col("distance") <= 0.95)
        .orderBy(col("distance").asc, col("vec_id").asc)
        .limit(100)
    },

    // batch_search: top-5 per query for the 8 query vectors vec_id < 8
    // (reference: src/collection/batch.rs:32-76)
    "batch_knn_cosine" -> Q(
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |         round(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS distance
        |  FROM embeddings e, q
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, vec_id) AS rn
        |  FROM scored
        |)
        |SELECT query_id, vec_id, distance FROM ranked WHERE rn <= 5
        |ORDER BY query_id, distance, vec_id""".stripMargin
    ) { (s, dir) =>
      // multi-partition input: the sf0.01 table is one file = one scan
      // partition, which collapses the aggregate to a single
      // merge(zero, partial) — a plan shape that masked a buffer-bound
      // mutation in TopKAgg (r18 audit: partial buffers of k+1 self-repair
      // when merged element-ascending into an empty buffer). Real scans
      // are multi-partition; make the gate's plan match.
      val emb = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
      val qs = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      // Bounded top-k aggregate, ranked on the ROUNDED distance (same as
      // the oracle) so rank-boundary ties resolve identically on both
      // sides; the shuffle carries k-element buffers, not all scored rows.
      graft.ops.Search.batchTopKPairs(emb, qs, k = 5,
          vecCol = "embedding", qVecCol = "qv", idCol = "vec_id",
          roundTo = Some(6))
        .orderBy(col("query_id").asc, col("distance").asc, col("vec_id").asc)
    },

    // Bulk batch search: EVERY vector in the collection queries it at once
    // (k=3) — the throughput-oriented surface. Spark's per-job overhead is
    // fixed, so the honest per-query cost of the engine is wall /
    // |queries|; this entry amortizes over the full collection (2 000
    // queries at sf0.1) through the same bounded top-k aggregate as
    // batch_knn_cosine — one scored pass, k-element shuffle buffers.
    "batch_knn_bulk" -> Q(
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |         round(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS distance
        |  FROM embeddings e, embeddings q),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, vec_id) AS rn
        |  FROM scored)
        |SELECT query_id, vec_id, distance FROM ranked WHERE rn <= 3
        |ORDER BY query_id, distance, vec_id""".stripMargin
    ) { (s, dir) =>
      // the collection lands in ONE scan partition (small single file);
      // spread it so the |queries|×|vectors| scoring pass uses every core —
      // at real scale files.maxPartitionBytes does this split natively
      val emb = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
      val qs = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      graft.ops.Search.batchTopKPairs(emb, qs, k = 3,
          vecCol = "embedding", qVecCol = "qv", idCol = "vec_id",
          roundTo = Some(6))
        .orderBy(col("query_id").asc, col("distance").asc, col("vec_id").asc)
    },
  )
}
