package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Distances
import graft.ops.Search

/** Additional oracle-checked entries closing out the SURVEY §2.3 search
  * family: recommend, keyset cursor pagination, score normalization,
  * filtered radius, filtered batch search.
  */
object MoreSearchQueries {

  private def qv(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))

  val defs: Map[String, Q] = Map(
    // recommend(positive, negative, k): query = mean(pos) − mean(neg),
    // f32-truncated centroids, seeds excluded
    // (reference: src/server/handlers/search.rs:1062-1150).
    "recommend" -> Q(
      """WITH pos AS (
        |  SELECT list(v ORDER BY dim) AS p FROM (
        |    SELECT dim, avg(x)::FLOAT AS v FROM (
        |      SELECT generate_subscripts(embedding, 1) AS dim, unnest(embedding)::DOUBLE AS x
        |      FROM embeddings WHERE vec_id IN (1, 2)) GROUP BY dim)
        |),
        |neg AS (
        |  SELECT list(v ORDER BY dim) AS n FROM (
        |    SELECT dim, avg(x)::FLOAT AS v FROM (
        |      SELECT generate_subscripts(embedding, 1) AS dim, unnest(embedding)::DOUBLE AS x
        |      FROM embeddings WHERE vec_id IN (3)) GROUP BY dim)
        |),
        |q AS (SELECT list_transform(range(1, len(p) + 1), i -> (p[i] - n[i])::FLOAT) AS qv
        |      FROM pos, neg)
        |SELECT vec_id, round(1 - list_cosine_similarity(embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS distance
        |FROM embeddings, q
        |WHERE vec_id NOT IN (1, 2, 3)
        |ORDER BY distance, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      Search.recommend(Tables.load(s, dir, "embeddings"),
        col("embedding"), col("vec_id"),
        positiveIds = Seq(1L, 2L), negativeIds = Seq(3L), k = 10)
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    },

    // search_after keyset cursor: strictly after (distance, id)
    // (reference: src/server/types.rs:216-219). The cursor is page-1's
    // last row, derived identically on both sides.
    "search_after" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id, round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |  FROM embeddings, q
        |),
        |cursor AS (
        |  SELECT distance AS cd, vec_id AS cid FROM scored
        |  ORDER BY distance, vec_id LIMIT 1 OFFSET 9
        |)
        |SELECT s.vec_id, s.distance FROM scored s, cursor
        |WHERE s.distance > cursor.cd OR (s.distance = cursor.cd AND s.vec_id > cursor.cid)
        |ORDER BY s.distance, s.vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      // drives the PRODUCTION Search.searchAfter (the r17 mutation audit
      // caught the previous form re-deriving the keyset filter inline —
      // a cursor-strictness mutation in Search was invisible). The cursor
      // (page-1's last row) is a bounded 1-row collect, the same
      // query-vector-read shape as the file's qv helper.
      val emb = Tables.load(s, dir, "embeddings")
      val scored = emb.crossJoin(broadcast(qv(s, dir)))
        .select(col("vec_id"),
          round(Distances.cosine(col("embedding"), col("qv")), 6).as("distance"))
      val cur = scored.orderBy(col("distance"), col("vec_id"))
        .limit(10).orderBy(col("distance").desc, col("vec_id").desc).limit(1)
        .select(col("distance"), col("vec_id")).collect()(0)
      Search.searchAfter(emb.crossJoin(broadcast(qv(s, dir))),
          col("embedding"), col("qv"), k = 10,
          cursorDistance = cur.getDouble(0), cursorId = cur.getLong(1),
          idCol = "vec_id", roundTo = Some(6))
        .select(col("vec_id"), col("distance"))
    },

    // Score normalization (reference: src/collection/search.rs:93-156):
    // MinMax (best→1, worst→0) and InverseDistance over a top-10 result.
    "normalize_scores" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |top AS (
        |  SELECT vec_id, round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |  FROM embeddings, q ORDER BY distance, vec_id LIMIT 10
        |),
        |mm AS (SELECT min(distance) AS mn, max(distance) AS mx FROM top)
        |SELECT vec_id, distance,
        |       round(CASE WHEN mm.mx = mm.mn THEN 1.0
        |                  ELSE (mm.mx - distance) / (mm.mx - mm.mn) END, 6) AS minmax_score,
        |       round(1.0 / (1.0 + distance), 6) AS inv_score
        |FROM top, mm ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val top = emb.crossJoin(broadcast(qv(s, dir)))
        .select(col("vec_id"),
          round(Distances.cosine(col("embedding"), col("qv")), 6).as("distance"))
        .orderBy(col("distance"), col("vec_id")).limit(10)
      val mm = Search.normalizeMinMax(top, outCol = "minmax_score")
      Search.normalizeInverseDistance(mm, outCol = "inv_score")
        .select(col("vec_id"), col("distance"),
          round(col("minmax_score"), 6).as("minmax_score"),
          round(col("inv_score"), 6).as("inv_score"))
        .orderBy(col("vec_id"))
    },

    // search_radius_with_filter (reference:
    // src/collection/search_methods.rs:789-847).
    "radius_filtered" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        |       round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |FROM embeddings, q
        |WHERE label < 5
        |  AND round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) <= 0.9
        |ORDER BY distance, vec_id LIMIT 50""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings").filter(col("label") < 5)
      emb.crossJoin(broadcast(qv(s, dir)))
        .select(col("vec_id"), col("label"),
          round(Distances.cosine(col("embedding"), col("qv")), 6).as("distance"))
        .filter(col("distance") <= 0.9)
        .orderBy(col("distance"), col("vec_id"))
        .limit(50)
    },

    // batch_search_with_filter (reference: src/collection/batch.rs:108):
    // shared filter applied before the per-query top-k window.
    "batch_knn_filtered" -> Q(
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 4),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |         round(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS distance
        |  FROM embeddings e, q WHERE e.label IN (0, 1, 2)
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, vec_id) AS rn
        |  FROM scored
        |)
        |SELECT query_id, vec_id, distance FROM ranked WHERE rn <= 3
        |ORDER BY query_id, distance, vec_id""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vector"))
      // filter → bounded top-k aggregate (no per-row window shuffle)
      graft.ops.Search.batchTopKPairs(
          emb.filter(col("label").isin(0, 1, 2)), queries, k = 3,
          vecCol = "embedding", idCol = "vec_id", roundTo = Some(6))
        .orderBy(col("query_id"), col("distance"), col("vec_id"))
    },

    // Cross-modal RRF list fusion (reference: multimodal_search.rs:470-525)
    // — two modalities over the SAME id space ('image' embeds the reversed
    // vector so ranks genuinely differ), per-modality weighted-cosine
    // top-10, RRF k=60 with first-list modality attribution. The oracle
    // replays rank + 1/(60+rank) aggregation in SQL.
    "crossmodal_rrf" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |a AS (SELECT vec_id::VARCHAR AS id, 'text' AS modality, 0 AS lst,
        |             1.0 * list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]) AS score
        |      FROM embeddings, q WHERE vec_id < 150
        |      ORDER BY score DESC, id LIMIT 10),
        |b AS (SELECT vec_id::VARCHAR AS id, 'image' AS modality, 1 AS lst,
        |             0.5 * list_cosine_similarity(list_reverse(embedding)::DOUBLE[], qv::DOUBLE[]) AS score
        |      FROM embeddings, q WHERE vec_id < 150
        |      ORDER BY score DESC, id LIMIT 10),
        |u AS (SELECT *, row_number() OVER (PARTITION BY lst ORDER BY score DESC, id) AS rnk
        |      FROM (SELECT * FROM a UNION ALL SELECT * FROM b)),
        |f AS (SELECT id, arg_min(modality, lst) AS modality,
        |             sum(1.0 / (60 + rnk)) AS raw
        |      FROM u GROUP BY id)
        |SELECT id, modality, round(raw, 6) AS score FROM f
        |ORDER BY raw DESC, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      import graft.ops.CrossModal._
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 150)
      val dims = 64
      val engine = new Engine(
        Seq(Modality("text", emb, dims, idCol = "vec_id", vecCol = "embedding"),
          Modality("image", emb.withColumn("embedding", reverse(col("embedding"))),
            dims, idCol = "vec_id", vecCol = "embedding")),
        weights = Map("text" -> 1.0, "image" -> 0.5),
        perModalityK = 10, fusion = Fusion.Rrf(60.0))
      val q = Tables.load(s, dir, "embeddings").filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      engine.search(s, q, Seq("text", "image"), k = 10)
        .select(col("id"), col("modality"), round(col("score"), 6).as("score"))
    },
  )
}
