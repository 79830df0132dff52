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
    // value hash of every vec_id ≡ 7 (mod 250) — a couple of ids, so most
    // buckets hash EQUAL and the differing set must be EXACTLY the buckets
    // holding perturbed ids (computed via the same bucket assignment) —
    // asserted in-plan as check_passed.
    "crdt_merkle_diff" -> Q.noOracle { (s, dir) =>
      val base = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), (col("vec_id") * 2654435761L % 2147483647L)
          .as("h"))
      val b = base.withColumn("h",
        when(col("vec_id") % 250 === 7, col("h") + 1).otherwise(col("h")))
      val diff = Crdt.merkleDiff(base, b, col("vec_id"), col("h"),
        bucketCount = 8)
      val expected = Crdt.bucketed(base, col("vec_id"), col("h"), 8)
        .filter(col("id").cast("long") % 250 === 7)
        .select(col("bucket")).distinct()
        .withColumn("__planted", lit(true))
      diff.join(expected, Seq("bucket"), "full_outer")
        .withColumn("check_passed",
          min(when(col("__planted").isNotNull && col("hash_a").isNotNull, 1)
            .otherwise(0))
            .over(org.apache.spark.sql.expressions.Window.partitionBy(lit(1)))
            === 1)
        .select(col("bucket"), col("hash_a"), col("hash_b"),
          col("count_a"), col("count_b"), col("check_passed"))
        .orderBy(col("bucket"))
    },
  )
}
