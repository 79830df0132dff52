package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{SearchBuilder, TimeDecay}

/** SearchBuilder pipeline queries (SURVEY.md §2.5): TTL + as_of + pre/post
  * filter + time decay, with the reference's exact stage order. The
  * "collection" derives deterministic timestamps from the embeddings table
  * (inserted_at = vec_id·1000 s, every 10th vector TTL-expired), and the
  * clock is pinned to now = 600 000 s so both engines see identical ages.
  */
object SearchPipelineQueries {

  private def collection(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .withColumn("inserted_at", col("vec_id") * 1000)
      .withColumn("ttl_expires_at",
        when(col("vec_id") % 10 === 0, 100L).otherwise(lit(null).cast("long")))

  private val collSql =
    """coll AS (
      |  SELECT vec_id, embedding, label, vec_id * 1000 AS inserted_at,
      |         CASE WHEN vec_id % 10 = 0 THEN 100 ELSE NULL END AS ttl_expires_at
      |  FROM embeddings
      |),
      |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)""".stripMargin

  private def builder(s: SparkSession, dir: String): SearchBuilder = {
    val coll = collection(s, dir)
    val qv = Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    SearchBuilder(
      df = coll.crossJoin(broadcast(qv)),
      query = col("qv"),
      vecCol = col("embedding"),
      idCol = col("vec_id"),
      insertedAtCol = Some(col("inserted_at")),
      ttlExpiresAtCol = Some(col("ttl_expires_at")),
      nowEpochS = Some(600000L),
      roundDistanceTo = Some(6))
  }

  val defs: Map[String, Q] = Map(
    // Full pipeline: TTL → as_of → pre-filter → fetch k×3 → post-filter →
    // k → exponential decay re-rank (reference execute order:
    // src/collection/pipeline.rs:414-447).
    "pipeline_full" -> Q(
      s"""WITH $collSql,
         |cand AS (
         |  SELECT c.vec_id, c.label, c.inserted_at,
         |         round(1 - list_cosine_similarity(c.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS distance
         |  FROM coll c, q
         |  WHERE (c.ttl_expires_at IS NULL OR c.ttl_expires_at > 600000)
         |    AND c.inserted_at <= 450000
         |    AND c.label < 5
         |),
         |fetched AS (SELECT * FROM cand ORDER BY distance, vec_id LIMIT 30),
         |posted AS (SELECT * FROM fetched WHERE label NOT IN (2, 4)
         |           ORDER BY distance, vec_id LIMIT 10)
         |SELECT vec_id,
         |       round(distance / exp((600000 - inserted_at) * (-ln(2) / 200000)), 6) AS distance,
         |       label
         |FROM posted
         |ORDER BY 2, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      builder(s, dir)
        .withK(10)
        .withFilter("""{"label": {"$lt": 5}}""")
        .withPostFilter("""{"label": {"$nin": [2, 4]}}""")
        .withAsOf(450000L)
        .withTimeDecay(TimeDecay.Exponential(200000L))
        .include("label")
        .execute()
        .select(col("vec_id"), round(col("distance"), 6).as("distance"), col("label"))
    },

    // max_age sugar = Step decay: the top-k is fetched first, then rows
    // older than the window are pushed to f32::MAX (kept, not dropped) —
    // the reference's documented quirk (pipeline.rs:404-411, :617-655).
    "pipeline_step_maxage" -> Q(
      // vec_id 0 (the query itself — always rank 1 at distance 0) is
      // planted at inserted_at 300000, i.e. age EXACTLY the max_age
      // window: the step boundary is inclusive (pipeline.rs:404-411) and
      // no natural fetched row sat AT it (r18 audit: the <= mutation was
      // GREEN until this plant).
      s"""WITH $collSql,
         |cand AS (
         |  SELECT c.vec_id,
         |         CASE WHEN c.vec_id = 0 THEN 300000
         |              ELSE c.inserted_at END AS inserted_at,
         |         round(1 - list_cosine_similarity(c.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS distance
         |  FROM coll c, q
         |),
         |fetched AS (SELECT * FROM cand ORDER BY distance, vec_id LIMIT 10)
         |SELECT vec_id,
         |       round(CASE WHEN 600000 - inserted_at <= 300000 THEN distance
         |                  ELSE 3.4028234663852886e38 END, 6) AS distance
         |FROM fetched
         |ORDER BY 2, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val coll = Tables.load(s, dir, "embeddings")
        .withColumn("inserted_at",
          when(col("vec_id") === 0, lit(300000L))
            .otherwise(col("vec_id") * 1000))
      val qv = Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      SearchBuilder(
        df = coll.crossJoin(broadcast(qv)),
        query = col("qv"),
        vecCol = col("embedding"),
        idCol = col("vec_id"),
        insertedAtCol = Some(col("inserted_at")),
        nowEpochS = Some(600000L),
        roundDistanceTo = Some(6))
        .withK(10)
        .withMaxAge(300000L)
        .execute()
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    },
  )
}
