package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Crdt

/** Oracle gates for CRDT replication (reference: src/experimental/crdt.rs).
  *
  * The op-log derives from `events`: id cycles mod 40, op cycles mod 7
  * (1 delete : 2 update : 4 add), and the HLC is an INJECTIVE encoding of
  * event_id — physical = event_id mod 97, logical = event_id div 97 — so
  * every op has a unique clock (the reference keys its op-log by HLC) while
  * physical collisions across replicas still occur, exercising the
  * logical/replica tiebreaks.
  */
object CrdtQueries {

  private val opsCte =
    """ops AS (
      |  SELECT event_id % 40 AS id,
      |         CASE event_id % 7 WHEN 0 THEN 'delete' WHEN 1 THEN 'update'
      |              WHEN 2 THEN 'update' ELSE 'add' END AS op,
      |         event_id % 97 AS physical,
      |         event_id // 97 AS logical,
      |         user_id % 4 AS replica,
      |         value AS payload
      |  FROM events WHERE event_id < 4000
      |)""".stripMargin

  private def opLog(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events").filter(col("event_id") < 4000).select(
      (col("event_id") % 40).as("id"),
      when(col("event_id") % 7 === 0, "delete")
        .when(col("event_id") % 7 === 1, "update")
        .when(col("event_id") % 7 === 2, "update")
        .otherwise("add").as("op"),
      (col("event_id") % 97).as("physical"),
      floor(col("event_id") / 97).as("logical"),
      (col("user_id") % 4).as("replica"),
      col("value").as("payload"))

  val defs: Map[String, Q] = Map(
    // Converged LWW state (crdt.rs:370-437): alive = latest Add out-ranks
    // latest Delete; payload = max-HLC op among the winning Add and the
    // Updates that out-rank it.
    "crdt_converge" -> Q(
      s"""WITH $opsCte,
        |adds AS (
        |  SELECT *, row_number() OVER (PARTITION BY id
        |    ORDER BY physical DESC, logical DESC, replica DESC) AS rn
        |  FROM ops WHERE op = 'add'
        |),
        |la AS (SELECT id, physical AS ap, logical AS al, replica AS ar
        |       FROM adds WHERE rn = 1),
        |dels AS (
        |  SELECT *, row_number() OVER (PARTITION BY id
        |    ORDER BY physical DESC, logical DESC, replica DESC) AS rn
        |  FROM ops WHERE op = 'delete'
        |),
        |ld AS (SELECT id, physical AS dp, logical AS dl, replica AS dr
        |       FROM dels WHERE rn = 1),
        |alive AS (
        |  SELECT la.* FROM la LEFT JOIN ld ON la.id = ld.id
        |  WHERE ld.id IS NULL OR (ap, al, ar) > (dp, dl, dr)
        |),
        |eff AS (
        |  SELECT o.id, o.payload, o.physical, o.logical, o.replica
        |  FROM ops o JOIN alive a ON o.id = a.id
        |  WHERE (o.op = 'add' AND o.physical = a.ap AND o.logical = a.al
        |         AND o.replica = a.ar)
        |     OR (o.op = 'update' AND
        |         (o.physical, o.logical, o.replica) > (a.ap, a.al, a.ar))
        |),
        |win AS (
        |  SELECT *, row_number() OVER (PARTITION BY id
        |    ORDER BY physical DESC, logical DESC, replica DESC) AS rn
        |  FROM eff
        |)
        |SELECT id, round(payload, 6) AS payload, physical, logical, replica
        |FROM win WHERE rn = 1 ORDER BY id""".stripMargin
    ) { (s, dir) =>
      Crdt.converge(opLog(s, dir))
        .select(col("id"), round(col("payload"), 6).as("payload"),
          col("physical"), col("logical"), col("replica"))
        .orderBy(col("id"))
    },

    // Merkle anti-entropy diff (crdt.rs:858-955): replica B perturbs the
    // value hash of every vec_id ≡ 7 (mod 250); the differing buckets and
    // their exact fold hashes are a full DuckDB oracle — the wrapping-u64
    // folds (id bytes ×31 + byte; bucket entries ×17 + id_hash +
    // value_hash, both in sorted-id order) replicate via HUGEINT
    // arithmetic mod 2^64 in list_reduce.
    "crdt_merkle_diff" -> Q(
      """WITH ent AS (
        |  SELECT CAST(vec_id AS VARCHAR) AS id,
        |         vec_id * 2654435761 % 2147483647 AS vh,
        |         CASE WHEN vec_id % 250 = 7
        |              THEN vec_id * 2654435761 % 2147483647 + 1
        |              ELSE vec_id * 2654435761 % 2147483647 END AS vhb
        |  FROM embeddings),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY id) - 1 AS rn,
        |         count(*) OVER () AS n
        |  FROM ent),
        |bkt AS (
        |  SELECT id, vh, vhb,
        |         CASE WHEN n // 8 = 0 THEN 7
        |              ELSE CAST(least(rn // (n // 8), 7) AS INT) END AS bucket,
        |         list_reduce(list_prepend(CAST(0 AS HUGEINT),
        |           list_transform(range(1, length(id) + 1),
        |             i -> CAST(ord(substr(id, i, 1)) AS HUGEINT))),
        |           (acc, b) -> (acc * 31 + b) % 18446744073709551616) AS ih
        |  FROM r),
        |agg AS (
        |  SELECT bucket,
        |         list_reduce(list_prepend(CAST(0 AS HUGEINT),
        |             list(ih + CAST(vh AS HUGEINT) ORDER BY id)),
        |           (acc, x) -> (acc * 17 + x) % 18446744073709551616) AS ha,
        |         list_reduce(list_prepend(CAST(0 AS HUGEINT),
        |             list(ih + CAST(vhb AS HUGEINT) ORDER BY id)),
        |           (acc, x) -> (acc * 17 + x) % 18446744073709551616) AS hb,
        |         count(*) AS cnt
        |  FROM bkt GROUP BY bucket)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(CASE WHEN ha >= 9223372036854775808
        |       THEN ha - 18446744073709551616 ELSE ha END AS BIGINT) AS hash_a,
        |  CAST(CASE WHEN hb >= 9223372036854775808
        |       THEN hb - 18446744073709551616 ELSE hb END AS BIGINT) AS hash_b,
        |  cnt AS count_a, cnt AS count_b
        |FROM agg WHERE ha <> hb ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      val base = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), (col("vec_id") * 2654435761L % 2147483647L)
          .as("h"))
      val b = base.withColumn("h",
        when(col("vec_id") % 250 === 7, col("h") + 1).otherwise(col("h")))
      Crdt.merkleDiff(base, b, col("vec_id"), col("h"), bucketCount = 8)
        .select(col("bucket").cast("long").as("bucket"),
          col("hash_a"), col("hash_b"), col("count_a"), col("count_b"))
        .orderBy(col("bucket"))
    },
  )
}
