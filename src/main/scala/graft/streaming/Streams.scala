package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming semantics (SURVEY.md §2.11). The reference has three streaming
  * shapes — CDC change streams with resume tokens (src/streaming/core.rs),
  * micro-batched ingestion with offset tracking/checkpoints
  * (src/streaming/ingestion.rs), and event-log replay/compaction
  * (src/streaming/event_log.rs). Structured Streaming provides each
  * natively: an append-only change table (or Kafka topic) is the stream,
  * the Spark checkpoint is the offset store, and `foreachBatch` + MERGE is
  * the streaming upsert. All functions below work on both batch and
  * streaming DataFrames (same Catalyst plans).
  */
object Streams {

  /** Change-event schema: `seq` is the resume token (monotonically
    * increasing, e.g. Kafka offset or log sequence).
    */
  val changeEventSchema: StructType = StructType(Seq(
    StructField("seq", LongType),
    StructField("op", StringType),          // insert | update | delete | drop_collection
    StructField("collection", StringType),
    StructField("id", StringType),
    StructField("vector", ArrayType(FloatType)),
    StructField("metadata", StringType),
    StructField("ts", LongType)))

  /** Filterable change feed with resume-token semantics (reference:
    * src/streaming/core.rs:290-443): events strictly after `resumeAfter`,
    * optionally restricted by op/collection/key predicates. Works on a
    * readStream of the change table just as well as on a batch read.
    */
  def changes(log: DataFrame, resumeAfter: Option[Long] = None,
              ops: Seq[String] = Nil, collection: Option[String] = None,
              keyPrefix: Option[String] = None): DataFrame = {
    var df = log
    resumeAfter.foreach(t => df = df.filter(col("seq") > t))
    if (ops.nonEmpty) df = df.filter(col("op").isin(ops: _*))
    collection.foreach(c => df = df.filter(col("collection") === c))
    keyPrefix.foreach(p => df = df.filter(col("id").startsWith(p)))
    df
  }

  /** Event-log replay (reference: src/streaming/event_log.rs): fold the log
    * into current state — last event per id wins, deletes drop the row.
    * One shuffle on the id key; at scale the log is partitioned by id range
    * so replay parallelizes per partition.
    */
  def replay(log: DataFrame, idCol: String = "id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("seq").desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("op") =!= "delete")
      .drop("__rn")
  }

  /** Event-log compaction: keep only each key's latest event (and drop
    * whole-key history below a delete) — the log-size bound of
    * event_log.rs's compaction.
    */
  def compactLog(log: DataFrame, idCol: String = "id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("seq").desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Debezium envelope schema (reference adapter:
    * src/streaming/cdc/debezium.rs): `{before, after, op, ts_ms}` with
    * op ∈ {c, r, u, d}.
    */
  def debeziumSchema(payload: StructType): StructType = StructType(Seq(
    StructField("before", payload),
    StructField("after", payload),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Parse a Debezium-format JSON column into normalized change events:
    * op c/r → insert, u → update, d → delete; the row payload is `after`
    * for upserts and `before` for deletes.
    */
  def parseDebezium(df: DataFrame, jsonCol: Column,
                    payload: StructType): DataFrame = {
    val parsed = df.withColumn("__env", from_json(jsonCol, debeziumSchema(payload)))
    parsed.select(
      when(col("__env.op").isin("c", "r"), "insert")
        .when(col("__env.op") === "u", "update")
        .when(col("__env.op") === "d", "delete")
        .as("op"),
      coalesce(col("__env.after"), col("__env.before")).as("row"),
      col("__env.ts_ms").as("ts_ms"))
  }

  /** Parse MongoDB change-stream envelopes (reference:
    * src/streaming/cdc/mongodb.rs:65-130): operationType → normalized op
    * (insert; update|replace → update; delete; drop|rename|dropDatabase|
    * invalidate → drop), ns.coll → collection, documentKey._id → key,
    * clusterTime seconds → ts_ms, fullDocument[BeforeChange] kept as JSON.
    */
  def parseMongoChangeStream(df: DataFrame, jsonCol: Column): DataFrame = {
    val schema = StructType(Seq(
      StructField("operationType", StringType),
      StructField("ns", StructType(Seq(
        StructField("db", StringType), StructField("coll", StringType)))),
      StructField("documentKey", StructType(Seq(StructField("_id", StringType)))),
      StructField("clusterTime", LongType),
      StructField("fullDocument", StringType),
      StructField("fullDocumentBeforeChange", StringType)))
    df.withColumn("__env", from_json(jsonCol, schema))
      .select(
        when(col("__env.operationType") === "insert", "insert")
          .when(col("__env.operationType").isin("update", "replace"), "update")
          .when(col("__env.operationType") === "delete", "delete")
          .when(col("__env.operationType").isin(
            "drop", "rename", "dropDatabase", "invalidate"), "drop")
          .as("op"),
        coalesce(col("__env.ns.coll"), lit("unknown")).as("collection"),
        col("__env.documentKey._id").as("document_key"),
        (col("__env.clusterTime") * 1000).as("ts_ms"),
        col("__env.fullDocument").as("row"),
        col("__env.fullDocumentBeforeChange").as("row_before"))
      .filter(col("op").isNotNull) // unknown op types are errors upstream
  }

  /** Parse the reference's Postgres logical-replication text format
    * (src/streaming/cdc/postgres.rs:71-160): a 1-char op prefix
    * ('I'/'U'/'D') followed by a JSON body carrying `table` and `id`;
    * table names map through `collectionMapping`.
    */
  def parsePgLogical(df: DataFrame, msgCol: Column,
                     collectionMapping: Map[String, String] = Map.empty): DataFrame = {
    val opChar = substring(msgCol, 1, 1)
    val body = msgCol.substr(lit(2), length(msgCol))
    // Each mapping compares against the RAW table name: folding over the
    // already-remapped expression would chain mappings transitively
    // ({"a"->"b","b"->"c"} sending table "a" to "c") and make the result
    // depend on Map iteration order.
    val rawTable = coalesce(get_json_object(body, "$.table"), lit("unknown"))
    val mapped = collectionMapping.foldLeft(rawTable) {
      case (acc, (t, c)) => when(rawTable === t, c).otherwise(acc)
    }
    df.select(
        when(opChar === "I", "insert").when(opChar === "U", "update")
          .when(opChar === "D", "delete").as("op"),
        mapped.as("collection"),
        get_json_object(body, "$.id").as("document_key"),
        body.as("row"))
      .filter(col("op").isNotNull)
  }

  /** Streaming ingest with upsert semantics (reference:
    * src/streaming/ingestion.rs:839-905 IngestionPipeline): every
    * micro-batch MERGEs into the target via [[graft.ops.Mutations.upsert]];
    * the Spark checkpoint directory carries the committed offsets (the
    * reference's OffsetTracker). `sink` receives the updated table per
    * batch (at scale: a Delta MERGE INTO / partitioned parquet rewrite).
    */
  /** Watermarked tumbling-window aggregation — the §2.11 superset the
    * reference lacks (its streaming has no windows/watermarks; SURVEY.md
    * flags this as a deliberate extension for pipeline observability:
    * events/sec, per-collection change rates). `lateness` drops events
    * older than the watermark; output is append-mode-compatible (finalized
    * windows only). At scale this is the standard shuffle-on-(window, key)
    * streaming agg with state store cleanup driven by the watermark.
    */
  def windowedCounts(stream: DataFrame, timeCol: String, keyCol: String,
                     windowDur: String, lateness: String): DataFrame =
    stream
      .withWatermark(timeCol, lateness)
      .groupBy(window(col(timeCol), windowDur).as("win"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("window_start"),
        col("win.end").as("window_end"), col(keyCol), col("n"))

  /** Streaming exact dedup across micro-batches (training-pipeline
    * superset; the batch analogue is graft.pipeline.Dedup.exact): drop
    * every record whose fingerprint column was already seen, with
    * watermark-bounded state — the state store retains fingerprints only
    * within `lateness` of the max event time, so state is O(unique keys
    * per watermark window), not O(stream), the standard scalable shape
    * for exactly-once dedup on an unbounded stream.
    */
  def streamingDedup(stream: DataFrame, fingerprintCol: String,
                     timeCol: String, lateness: String): DataFrame =
    stream
      .withWatermark(timeCol, lateness)
      .dropDuplicatesWithinWatermark(fingerprintCol)

  /** Unbounded-state variant: dedup on the fingerprint alone (exact
    * parity with batch Dedup.exact keepers). State grows with unique
    * keys — use the watermarked form on 100 TB streams.
    */
  def streamingDedupGlobal(stream: DataFrame, fingerprintCol: String): DataFrame =
    stream.dropDuplicates(fingerprintCol)

  def ingestUpsert(stream: DataFrame, idCol: String,
                   checkpointDir: String,
                   initial: DataFrame)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state = initial
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // last event per id within the batch, then MERGE
        val deduped = batch.dropDuplicates(idCol)
        state = graft.ops.Mutations.upsert(state, deduped, idCol)
          .localCheckpoint(true) // cut lineage across micro-batches
        sink(state)
      }
      .start()
  }
}
