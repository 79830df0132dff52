package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Kafka CDC transport (SURVEY.md §2.1; reference:
  * src/streaming/cdc/kafka.rs — consumer config :24-96, subscribe/poll
  * loop :98-210).
  *
  * The Spark "kafka" DataSource is resolved by NAME at runtime
  * (spark-sql-kafka-0-10 on the cluster classpath), so this wiring
  * compiles with no Kafka dependency; [[source]] throws
  * `ClassNotFoundException`/`AnalysisException` only when the connector
  * jar is genuinely absent (as in this sandbox — documented in
  * COVERAGE.md §2.1). Everything downstream of [[source]] —
  * value-decode → envelope parse → per-batch CDC apply — is
  * transport-agnostic and contract-tested from a MemoryStream, which is
  * exactly the surface a Kafka topic would feed.
  */
object KafkaCdc {

  /** Mirrors the reference KafkaCdcConfig (kafka.rs:24-56). */
  final case class Config(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "latest", // ≙ auto.offset.reset
      maxOffsetsPerTrigger: Option[Long] = None, // ≙ max.poll.records
      failOnDataLoss: Boolean = true,
      extraOptions: Map[String, String] = Map.empty)

  /** The live Kafka stream as (topic, key, json) — requires the kafka
    * connector on the runtime classpath.
    */
  def source(spark: SparkSession, cfg: Config): DataFrame = {
    var r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", cfg.topics.mkString(","))
      .option("startingOffsets", cfg.startingOffsets)
      .option("failOnDataLoss", cfg.failOnDataLoss.toString)
    cfg.maxOffsetsPerTrigger.foreach(n =>
      r = r.option("maxOffsetsPerTrigger", n.toString))
    cfg.extraOptions.foreach { case (k, v) => r = r.option(k, v) }
    decode(r.load())
  }

  /** Kafka's fixed output schema → (topic, key, json). Factored out so the
    * contract test can feed a MemoryStream shaped like a Kafka frame
    * through the identical projection.
    */
  def decode(kafkaFrame: DataFrame): DataFrame =
    kafkaFrame.select(
      col("topic"),
      col("key").cast("string").as("key"),
      col("value").cast("string").as("json"))

  /** Apply one micro-batch of NORMALIZED change events — any frame with
    * (op, document_key, row) columns, i.e. the output of
    * parseMongoChangeStream / parsePgLogical (for Debezium, extract the
    * key from the row payload first) — to a state table keyed by `idCol`:
    * insert/update upsert the event's row, delete removes the key; within
    * a batch the LAST event per key wins. Ordering note:
    * `monotonically_increasing_id` is monotone within a partition, the
    * Kafka source emits rows in offset order per partition, and a CDC key
    * lives in one partition — so per-key last-wins here IS offset order,
    * the same guarantee kafka.rs relies on.
    */
  def applyCdcBatch(state: DataFrame, events: DataFrame,
                    idCol: String = "id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val last = events
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("document_key"))
          .orderBy(monotonically_increasing_id().desc)))
      .filter(col("__rn") === 1)
      .select(col("document_key").as(idCol), col("op"), col("row"))
    val deletes = last.filter(col("op") === "delete").select(col(idCol))
    val upserts = last.filter(col("op") =!= "delete")
      .select(col(idCol), col("row"))
    graft.ops.Mutations.upsert(
      state.join(deletes, Seq(idCol), "left_anti"), upserts, idCol)
  }

  /** Pulsar transport twin (reference: src/streaming/cdc/pulsar.rs —
    * PulsarConnectorConfig :10-96): same downstream contract, different
    * connector options (StreamNative pulsar-spark resolves "pulsar" by
    * name at runtime, exactly like the Kafka source).
    */
  final case class PulsarConfig(
      serviceUrl: String,                       // pulsar://host:6650
      topic: String,                            // persistent://tenant/ns/topic
      subscription: String = "graft-cdc",       // ≙ subscription_name
      startingOffsets: String = "latest",       // ≙ initial_position
      extraOptions: Map[String, String] = Map.empty)

  /** The live Pulsar stream, decoded to the same (topic, key, json) shape
    * — requires the pulsar-spark connector on the runtime classpath.
    */
  def pulsarSource(spark: SparkSession, cfg: PulsarConfig): DataFrame = {
    var r = spark.readStream.format("pulsar")
      .option("service.url", cfg.serviceUrl)
      .option("topics", cfg.topic)
      .option("subscription.name", cfg.subscription)
      .option("startingOffsets", cfg.startingOffsets)
    cfg.extraOptions.foreach { case (k, v) => r = r.option(k, v) }
    // pulsar frames carry __topic/__key; normalize to the kafka shape
    r.load().select(
      col("__topic").as("topic"),
      col("__key").cast("string").as("key"),
      col("value").cast("string").as("json"))
  }

  /** End-to-end ingest: a (topic, key, json) stream → `parse` (one of
    * Streams.parseDebezium / parseMongoChangeStream / parsePgLogical) →
    * per-batch CDC apply, offsets checkpointed by Spark. The SAME code
    * path serves Kafka ([[source]]), Pulsar ([[pulsarSource]]), and the
    * MemoryStream contract test.
    */
  def runIngest(decoded: DataFrame, checkpointDir: String,
                initial: DataFrame, idCol: String = "id")(
      parse: (DataFrame, Column) => DataFrame)(
      sink: DataFrame => Unit): StreamingQuery = {
    var state = initial
    decoded.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val events = parse(batch, col("json"))
        state = applyCdcBatch(state, events, idCol)
          .localCheckpoint(true) // cut lineage across micro-batches
        sink(state)
      }
      .start()
  }
}
