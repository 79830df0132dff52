package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.streaming.Streams

/** Batch-checkable slices of the streaming layer (SURVEY.md §2.11): the
  * change-feed filters, event-log replay fold and Debezium parse are plain
  * Catalyst plans, so the same code paths that run under Structured
  * Streaming are verified here against a SQL oracle on the events table
  * (event_id doubles as the resume token / log sequence).
  */
object StreamQueries {

  /** events as a change log: signup→insert, purchase→update, error→delete,
    * key = user_id, seq = event_id.
    */
  private val opExpr =
    """CASE event_type WHEN 'signup' THEN 'insert'
      |                WHEN 'purchase' THEN 'update'
      |                WHEN 'error' THEN 'delete'
      |                ELSE 'insert' END""".stripMargin

  private def asLog(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events").select(
      col("event_id").as("seq"),
      when(col("event_type") === "signup", "insert")
        .when(col("event_type") === "purchase", "update")
        .when(col("event_type") === "error", "delete")
        .otherwise("insert").as("op"),
      col("user_id").as("id"),
      col("value"))

  val defs: Map[String, Q] = Map(
    // Change feed with resume token + op filter (core.rs:290-443).
    "change_feed" -> Q(
      s"""SELECT event_id AS seq, $opExpr AS op, user_id AS id, value
         |FROM events
         |WHERE event_id > 5000 AND $opExpr IN ('update', 'delete')
         |ORDER BY seq""".stripMargin
    ) { (s, dir) =>
      Streams.changes(asLog(s, dir), resumeAfter = Some(5000L),
        ops = Seq("update", "delete"))
        .orderBy(col("seq"))
    },

    // Event-log replay: last event per key wins, deletes drop the key
    // (event_log.rs).
    "event_replay" -> Q(
      s"""WITH log AS (
         |  SELECT event_id AS seq, $opExpr AS op, user_id AS id, value
         |  FROM events
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
         |  FROM log
         |)
         |SELECT seq, op, id, value FROM ranked
         |WHERE rn = 1 AND op <> 'delete'
         |ORDER BY id""".stripMargin
    ) { (s, dir) =>
      Streams.replay(asLog(s, dir)).orderBy(col("id"))
    },

    // Streaming LWW-register convergence, batch-checked: the SAME
    // flatMapGroupsWithState arbitration that serves the change stream
    // (streaming/StatefulLww.scala) converges the events-derived op-log
    // in batch mode, and DuckDB replays max-HLC-rank-per-key as a
    // window. logical = event_id keeps every rank unique, so the strict
    // takeover and row_number agree without tie semantics in play.
    "lww_converge" -> Q(
      s"""WITH log AS (
         |  SELECT CAST(user_id % 40 AS VARCHAR) AS id,
         |         CAST(floor(epoch(ts)) AS BIGINT) AS physical,
         |         event_id AS logical,
         |         'r' || CAST(user_id % 5 AS VARCHAR) AS replica,
         |         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'add' END AS op,
         |         event_type AS payload
         |  FROM events
         |),
         |ranked AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY id ORDER BY physical DESC, logical DESC, replica DESC) AS rn
         |  FROM log
         |)
         |SELECT id, physical, logical, replica,
         |       CAST(CASE WHEN op <> 'delete' THEN 1 ELSE 0 END AS BIGINT) AS alive,
         |       payload
         |FROM ranked WHERE rn = 1 ORDER BY id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val ops = Tables.load(s, dir, "events").select(
        pmod(col("user_id"), lit(40L)).cast("string").as("id"),
        unix_timestamp(col("ts")).as("physical"),
        col("event_id").as("logical"),
        concat(lit("r"), pmod(col("user_id"), lit(5L)).cast("string"))
          .as("replica"),
        when(col("event_type") === "error", "delete").otherwise("add")
          .as("op"),
        col("event_type").as("payload"))
        .as[graft.streaming.StatefulLww.Op]
      graft.streaming.StatefulLww.changes(ops)
        .toDF()
        .select(col("id"), col("physical"), col("logical"), col("replica"),
          col("alive").cast("long").as("alive"), col("payload"))
        .orderBy(col("id"))
    },

    // Debezium envelope parse: envelopes constructed identically on both
    // sides, parsed with from_json vs json_extract.
    "debezium_parse" -> Q(
      """WITH env AS (
        |  SELECT event_id,
        |         '{"op":"' || (CASE WHEN event_id % 3 = 0 THEN 'c'
        |                            WHEN event_id % 3 = 1 THEN 'u'
        |                            ELSE 'd' END) ||
        |         '","after":{"pk":' || event_id || ',"val":' || CAST(value AS VARCHAR) ||
        |         '},"before":{"pk":' || event_id || ',"val":0.0},"ts_ms":' ||
        |         CAST(event_id * 10 AS VARCHAR) || '}' AS json
        |  FROM events WHERE event_id < 200
        |)
        |SELECT CASE json_extract_string(json, '$.op')
        |            WHEN 'c' THEN 'insert' WHEN 'r' THEN 'insert'
        |            WHEN 'u' THEN 'update' ELSE 'delete' END AS op,
        |       CAST(json_extract(json, '$.after.pk') AS BIGINT) AS pk,
        |       CAST(json_extract(json, '$.after.val') AS DOUBLE) AS val,
        |       CAST(json_extract(json, '$.ts_ms') AS BIGINT) AS ts_ms
        |FROM env ORDER BY pk""".stripMargin
    ) { (s, dir) =>
      val env = Tables.load(s, dir, "events").filter(col("event_id") < 200)
        .select(col("event_id"), concat(
          lit("""{"op":""""),
          when(col("event_id") % 3 === 0, "c")
            .when(col("event_id") % 3 === 1, "u").otherwise("d"),
          lit("""","after":{"pk":"""), col("event_id"),
          lit(""","val":"""), col("value").cast("string"),
          lit("""},"before":{"pk":"""), col("event_id"),
          lit(""","val":0.0},"ts_ms":"""), (col("event_id") * 10).cast("string"),
          lit("}")).as("json"))
      val payload = StructType(Seq(StructField("pk", LongType),
        StructField("val", DoubleType)))
      Streams.parseDebezium(env, col("json"), payload)
        .select(col("op"), col("row.pk").as("pk"),
          col("row.val").as("val"), col("ts_ms"))
        .orderBy(col("pk"))
    },
  )
}
