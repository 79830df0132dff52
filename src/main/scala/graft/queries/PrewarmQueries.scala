package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Prewarm

/** Oracle gate for predictive query pre-warming (reference:
  * src/experimental/query_prewarming.rs): the query history derives from
  * `embeddings` with synthetic week-spread timestamps, and the full
  * predict pipeline — temporal×decay scoring, top-3k candidate pool,
  * per-collection weighted centroids, confidence gating — is replayed in
  * SQL (centroid sampled at dims 0 and 1).
  */
object PrewarmQueries {

  private val now = 1700604800L

  val defs: Map[String, Q] = Map(
    "prewarm_predict" -> Q(
      s"""WITH h AS (
        |  SELECT 'c' || (vec_id % 3) AS collection, embedding,
        |         CAST(10 + vec_id % 40 AS BIGINT) AS k,
        |         $now - (vec_id * 173) % 86400 -
        |           CASE WHEN vec_id % 3 = 2 THEN 345600 ELSE 0 END AS ts
        |  FROM embeddings
        |),
        |sc AS (
        |  SELECT collection, embedding, k, ts,
        |         (0.7 * (1.0 - least(abs((ts % 86400) // 3600 - ($now % 86400) // 3600),
        |                             24 - abs((ts % 86400) // 3600 - ($now % 86400) // 3600))::DOUBLE / 12.0) +
        |          0.3 * (1.0 - least(abs((ts // 86400 + 3) % 7 - ($now // 86400 + 3) % 7),
        |                             7 - abs((ts // 86400 + 3) % 7 - ($now // 86400 + 3) % 7))::DOUBLE / 3.5)) *
        |         pow(0.95, greatest($now - ts, 0) / 3600.0) AS score
        |  FROM h
        |),
        |cand AS (
        |  SELECT * FROM sc
        |  QUALIFY row_number() OVER (ORDER BY score DESC, ts DESC, collection) <= 15
        |),
        |tot AS (
        |  SELECT collection, sum(score) AS t, avg(score) AS conf,
        |         CAST(floor(sum(k)::DOUBLE / count(*)) AS BIGINT) AS avg_k
        |  FROM cand GROUP BY collection
        |),
        |el AS (
        |  SELECT c.collection, generate_subscripts(c.embedding, 1) AS dim,
        |         unnest(c.embedding)::DOUBLE AS x, c.score, t.t
        |  FROM cand c JOIN tot t USING (collection)
        |),
        |cent AS (
        |  SELECT collection, dim, (sum(x * score / t))::FLOAT AS v
        |  FROM el GROUP BY collection, dim
        |)
        |SELECT t.collection, round(least(t.conf, 1.0), 6) AS confidence,
        |       t.avg_k, round(c1.v::DOUBLE, 6) AS c0, round(c2.v::DOUBLE, 6) AS c1
        |FROM tot t
        |JOIN cent c1 ON c1.collection = t.collection AND c1.dim = 1
        |JOIN cent c2 ON c2.collection = t.collection AND c2.dim = 2
        |WHERE least(t.conf, 1.0) >= 0.5
        |ORDER BY least(t.conf, 1.0) DESC, t.collection""".stripMargin
    ) { (s, dir) =>
      val history = Tables.load(s, dir, "embeddings").select(
        concat(lit("c"), col("vec_id") % 3).as("collection"),
        col("embedding"),
        (lit(10L) + col("vec_id") % 40).as("k"),
        // c2's history is four days stale, so decay pushes it out of the
        // top-15 candidate pool entirely — the truncation does real work
        (lit(now) - (col("vec_id") * 173) % 86400 -
          when(col("vec_id") % 3 === 2, 345600L).otherwise(0L)).as("ts"))
      Prewarm.predictNext(history, now, limit = 3,
          Prewarm.Config())
        .select(col("collection"), round(col("confidence"), 6).as("confidence"),
          col("avg_k"),
          round(element_at(col("predicted_embedding"), 1).cast("double"), 6)
            .as("c0"),
          round(element_at(col("predicted_embedding"), 2).cast("double"), 6)
            .as("c1"))
    },
  )
}
