package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Distances
import graft.ops.{Bandits, Federated}

/** Oracle gates for federated result merging (reference:
  * src/search/federated/merger.rs) and the Thompson-sampling bandits
  * reranker (reference: src/search/reranker.rs:596-816). Both are pure
  * relational algebra once the reference's RNG is replaced by the
  * documented deterministic noise hash, so both get full DuckDB oracles.
  *
  * Federated sources are three overlapping shards of the embeddings table
  * (vec_id%3 ∈ {s, s+1}) — every id appears in exactly two sources, so
  * dedup/consensus semantics are actually exercised.
  */
object FederatedQueries {

  private val shardedTop10 =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |scored AS (
      |  SELECT g.s, e.vec_id AS id,
      |         round(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS distance
      |  FROM embeddings e CROSS JOIN q CROSS JOIN (VALUES (0), (1), (2)) g(s)
      |  WHERE e.vec_id % 3 = g.s OR e.vec_id % 3 = (g.s + 1) % 3
      |),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY s ORDER BY distance, id) AS rnk
      |  FROM scored
      |),
      |top AS (SELECT * FROM ranked WHERE rnk <= 10)""".stripMargin

  private def sources(s: org.apache.spark.sql.SparkSession, dir: String,
                      perShardK: Int => Int = _ => 10) = {
    val emb = Tables.load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    (0 to 2).map { i =>
      s"shard$i" -> emb
        .filter(col("vec_id") % 3 === i || col("vec_id") % 3 === (i + 1) % 3)
        .select(col("vec_id").as("id"),
          round(Distances.cosine(col("embedding"), lit(q)), 6)
            .as("distance"))
        .orderBy(col("distance").asc, col("id").asc)
        .limit(perShardK(i))
    }
  }

  /** Consensus needs count VARIANCE in the pooled set to make its
    * ordering observable: with all three shards at top-10, every pooled
    * id lands in BOTH of its shards' top-10s (verified on sf0.01 — all 15
    * pooled ids had consensus_count exactly 2, which left an
    * ordering-direction mutation green in the r17 audit). Capping shard 2
    * at top-5 drops its rank-6..10 ids to count 1.
    */
  private val consensusTop5Cap: Int => Int = i => if (i == 2) 5 else 10

  private val consensusTop =
    """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |scored AS (
      |  SELECT g.s, e.vec_id AS id,
      |         round(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS distance
      |  FROM embeddings e CROSS JOIN q CROSS JOIN (VALUES (0), (1), (2)) g(s)
      |  WHERE e.vec_id % 3 = g.s OR e.vec_id % 3 = (g.s + 1) % 3
      |),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY s ORDER BY distance, id) AS rnk
      |  FROM scored
      |),
      |top AS (SELECT * FROM ranked
      |        WHERE rnk <= CASE WHEN s = 2 THEN 5 ELSE 10 END)""".stripMargin

  val defs: Map[String, Q] = Map(
    // RRF merge across shards: Σ 1/(60+per-source-rank), descending
    // (merger.rs:88-114); surviving payload = best-distance occurrence.
    "federated_rrf" -> Q(
      s"""$shardedTop10,
        |rrf AS (
        |  SELECT id, min(distance) AS distance, sum(1.0 / (60 + rnk)) AS raw
        |  FROM top GROUP BY id
        |)
        |SELECT id, distance, round(raw, 6) AS rrf_score
        |FROM rrf ORDER BY raw DESC, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      Federated.merge(sources(s, dir), k = 10,
          Federated.Strategy.ReciprocalRankFusion)
        .select(col("id"), col("distance"),
          round(col("rrf_score"), 6).as("rrf_score"))
    },

    // Consensus merge: ids seen by more sources first, ties by average
    // distance (merger.rs:130-165). Shard 2 is capped at top-5 (see
    // consensusTop5Cap) so the pooled counts genuinely vary and the
    // count-first ordering is falsifiable.
    "federated_consensus" -> Q(
      s"""$consensusTop
        |SELECT id, count(*) AS consensus_count,
        |       round(avg(distance), 6) AS distance
        |FROM top GROUP BY id
        |ORDER BY consensus_count DESC, avg(distance) ASC, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      Federated.merge(sources(s, dir, consensusTop5Cap), k = 10,
          Federated.Strategy.Consensus)
        .select(col("id"), col("consensus_count"),
          round(col("distance"), 6).as("distance"))
    },

    // Bandits rerank: Beta posteriors from an event-derived feedback log,
    // Thompson score = clamp(mean + noise·stddev, 0, 1) with the
    // deterministic noise hash (reranker.rs:651-663; noise documented in
    // ops/Bandits.scala), candidates = cosine top-20 over vec_id < 50.
    "bandit_rerank" -> Q(
      """WITH fb AS (
        |  SELECT user_id % 50 AS id, (event_id % 11) / 10.0 AS rel
        |  FROM events WHERE event_id < 5000
        |),
        |params AS (
        |  SELECT id, 1.0 + sum(rel) AS alpha, 1.0 + sum(1.0 - rel) AS beta
        |  FROM fb GROUP BY id
        |),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |cand AS (
        |  SELECT e.vec_id AS id,
        |         round(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS distance
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id < 50
        |  ORDER BY distance, id LIMIT 20
        |),
        |joined AS (
        |  SELECT c.id, c.distance,
        |         coalesce(p.alpha, 1.0) AS a, coalesce(p.beta, 1.0) AS b
        |  FROM cand c LEFT JOIN params p ON c.id = p.id
        |),
        |scored AS (
        |  SELECT id, distance,
        |         least(greatest(
        |           a / (a + b) +
        |           (((id + 7) * 2654435761 % 100000) / 50000.0 - 1.0) *
        |             sqrt(a * b / (pow(a + b, 2) * (a + b + 1.0))),
        |           0.0), 1.0) AS ts
        |  FROM joined
        |)
        |SELECT id, distance, round(ts, 6) AS thompson_score
        |FROM scored ORDER BY ts DESC, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val fb = Tables.load(s, dir, "events")
        .filter(col("event_id") < 5000)
        .select((col("user_id") % 50).as("id"),
          ((col("event_id") % 11) / 10.0).as("relevance"))
      val params = Bandits.fitParams(fb)
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val cand = emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("id"),
          round(Distances.cosine(col("embedding"), lit(q)), 6)
            .as("distance"))
        .orderBy(col("distance").asc, col("id").asc)
        .limit(20)
      Bandits.rerank(cand, params, seed = 7)
        .limit(10)
        .select(col("id"), col("distance"),
          round(col("thompson_score"), 6).as("thompson_score"))
    },
  )
}
