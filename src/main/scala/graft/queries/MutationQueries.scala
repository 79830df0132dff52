package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.core.Tables
import graft.ops.Mutations

/** Mutation-operator queries (SURVEY.md §2.1): upsert, merge-patch, TTL
  * sweep + compact, dedup-on-insert — each as a deterministic
  * transformation over the testdata with a DuckDB oracle replicating the
  * MERGE semantics in SQL.
  */
object MutationQueries {

  val defs: Map[String, Q] = Map(
    // MERGE upsert: 100 replaced rows (value doubled) + 10 new ids.
    "upsert_merge" -> Q(
      """WITH updates AS (
        |  SELECT event_id, ts, user_id, event_type, value * 2 AS value, props
        |  FROM events WHERE event_id < 100
        |  UNION ALL
        |  SELECT event_id + 1000000, ts, user_id, event_type, value, props
        |  FROM events WHERE event_id < 10
        |),
        |merged AS (
        |  SELECT * FROM events
        |  WHERE event_id NOT IN (SELECT event_id FROM updates)
        |  UNION ALL SELECT * FROM updates
        |)
        |SELECT count(*) AS n, round(sum(value), 4) AS total FROM merged""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val updates = ev.filter(col("event_id") < 100)
        .withColumn("value", col("value") * 2)
        .unionByName(ev.filter(col("event_id") < 10)
          .withColumn("event_id", col("event_id") + 1000000))
      Mutations.upsert(ev, updates, "event_id")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
    },

    // Shallow JSON merge-patch (reference: metadata.rs:538-561): null
    // removes a key, new keys insert. Output extracted fields, not raw JSON
    // (string formatting differs between engines). `k_present` asserts the
    // REMOVAL itself: value extraction returns NULL for both a removed key
    // and a stored JSON null, so without it a null-keeping mutation is
    // invisible (r17 mutation-audit finding) — key presence is read from
    // map_keys/json_keys, which do distinguish.
    "merge_patch" -> Q(
      """SELECT event_id,
        |       json_extract_string(json_merge_patch(props, '{"k": null, "added": 7}'), '$.k') AS k_after,
        |       CAST(coalesce(list_contains(json_keys(json_merge_patch(props, '{"k": null, "added": 7}')), 'k'), false) AS BIGINT) AS k_present,
        |       json_extract_string(json_merge_patch(props, '{"k": null, "added": 7}'), '$.added') AS added_after
        |FROM events WHERE event_id < 50 ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.load(s, dir, "events").filter(col("event_id") < 50)
      val patches = ev.select(col("event_id"),
        lit("""{"k": null, "added": 7}""").as("props"))
      Mutations.mergePatch(ev, patches, "event_id", "props")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_after"),
          coalesce(array_contains(
            map_keys(from_json(col("props"), MapType(StringType, StringType))),
            "k"), lit(false)).cast("long").as("k_present"),
          get_json_object(col("props"), "$.added").as("added_after"))
        .orderBy(col("event_id"))
    },

    // Tombstone + TTL sweep + physical compaction
    // (reference: mutations.rs:27, ttl.rs:52, accessors.rs:166).
    // Three TTL classes so the expiry BOUNDARY is load-bearing: %5 rows
    // expired in the past (ttl 100 < now), %3 rows expire exactly AT now
    // (ttl 200 == now — expired, the reference drops at `now >=
    // expiration`, ttl.rs:52), rest never expire. The r16
    // gate-sensitivity audit caught the old two-class fixture as
    // boundary-insensitive (a `>` → `>=` sweep mutation stayed green).
    "ttl_compact" -> Q(
      """SELECT count(*) AS n FROM events
        |WHERE event_id % 5 <> 0 AND event_id % 3 <> 0 AND event_id % 7 <> 0""".stripMargin
    ) { (s, dir) =>
      val coll = Tables.load(s, dir, "events")
        .withColumn("ttl_expires_at",
          when(col("event_id") % 5 === 0, 100L)
            .when(col("event_id") % 3 === 0, 200L)
            .otherwise(lit(null).cast("long")))
        .withColumn("deleted", lit(false))
      val tombstoned = Mutations.tombstone(coll, col("event_id") % 7 === 0)
      Mutations.compact(tombstoned, nowEpochS = 200L)
        .agg(count(lit(1)).as("n"))
    },

    // Dedup-on-insert with Reject policy (reference: dedup.rs:82-160):
    // 20 exact duplicates (rejected, 1-NN distance 0) + 5 shifted vectors
    // (inserted).
    "dedup_insert_reject" -> Q(
      """WITH incoming AS (
        |  SELECT vec_id + 10000 AS id, embedding FROM embeddings WHERE vec_id < 20
        |  UNION ALL
        |  SELECT vec_id + 20000 AS id,
        |         list_transform(embedding, x -> x + 1.0)::FLOAT[] AS embedding
        |  FROM embeddings WHERE vec_id < 5
        |),
        |nn AS (
        |  SELECT i.id,
        |         min({'d': round(1 - list_cosine_similarity(i.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6),
        |              'eid': e.vec_id}) AS m
        |  FROM incoming i, embeddings e GROUP BY i.id
        |)
        |SELECT id,
        |       CASE WHEN m.d < 0.001 THEN 'rejected' ELSE 'inserted' END AS outcome,
        |       CASE WHEN m.d < 0.001 THEN m.eid ELSE NULL END AS existing_id,
        |       CASE WHEN m.d < 0.001 THEN m.d ELSE NULL END AS distance
        |FROM nn ORDER BY id""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val coll = emb.select(col("vec_id").as("id"), col("embedding"))
      val incoming = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 10000).as("id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id") < 5)
          .select((col("vec_id") + 20000).as("id"),
            transform(col("embedding"), x => x + 1.0f).cast("array<float>")
              .as("embedding")))
      Mutations.dedupInsert(coll, incoming, threshold = 0.001,
        Mutations.DedupPolicy.Reject, idCol = "id", vecCol = "embedding")
        .outcomes
        .orderBy(col("id"))
    },
  )
}
