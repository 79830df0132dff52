package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Distances
import graft.ops.Hooks

/** Oracle gate for the hook registry (reference: src/hooks.rs): a full
  * pre-insert → search → post-search chain. The store duplicates ids < 50
  * so dedup_results has real work; insert hooks validate dims, L2-
  * normalize, and stamp _inserted_at; search is euclidean top-20 over the
  * NORMALIZED store (normalization changes euclidean ranking, so the
  * insert hook's effect is visible in the result); post-search hooks
  * apply score_threshold(1.2) then dedup (first occurrence = minimum
  * distance for an id).
  */
object HookQueries {

  val defs: Map[String, Q] = Map(
    "hooked_pipeline" -> Q(
      """WITH store AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50
        |),
        |norm AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> (x::DOUBLE / sqrt(list_sum(list_transform(embedding,
        |                 y -> y::DOUBLE * y::DOUBLE))))::FLOAT) AS v
        |  FROM store
        |),
        |q AS (SELECT v AS qv FROM norm WHERE vec_id = 0 LIMIT 1),
        |d AS (SELECT vec_id, list_distance(n.v::DOUBLE[], q.qv::DOUBLE[]) AS distance
        |      FROM norm n CROSS JOIN q),
        |ranked AS (SELECT vec_id, distance,
        |                  row_number() OVER (ORDER BY distance, vec_id) AS rn
        |           FROM d),
        |thr AS (SELECT vec_id, distance FROM ranked
        |        WHERE rn <= 20 AND distance <= 1.2),
        |ded AS (SELECT vec_id, min(distance) AS distance FROM thr GROUP BY vec_id)
        |SELECT vec_id, round(distance, 6) AS distance,
        |       1700000000 AS inserted_at
        |FROM ded ORDER BY distance, vec_id""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val store = emb.unionAll(emb.filter(col("vec_id") < 50))
      val reg = new Hooks.Registry
      reg.registerInsertHook("validate",
        Hooks.validateDimensions("embedding", 64, reg))
      reg.registerInsertHook("normalize", Hooks.normalizeL2("embedding"))
      reg.registerInsertHook("timestamp", Hooks.addTimestamp(1700000000L))
      reg.registerSearchHook("threshold", Hooks.scoreThreshold("distance", 1.2))
      reg.registerSearchHook("dedup", Hooks.dedupResults("vec_id", "distance"))
      val hooked = reg.runInsertHooks(store)
      val q = hooked.filter(col("vec_id") === 0).limit(1)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val top = hooked
        .select(col("vec_id"), col("_inserted_at"),
          Distances.distance("euclidean", col("embedding"), lit(q))
            .as("distance"))
        .orderBy(col("distance").asc, col("vec_id").asc)
        .limit(20)
      reg.runSearchHooks(top)
        .select(col("vec_id"), round(col("distance"), 6).as("distance"),
          col("_inserted_at").cast("int").as("inserted_at"))
        .orderBy(col("distance"), col("vec_id"))
    },
  )
}
