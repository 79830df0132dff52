package graft

import org.apache.spark.sql.functions._

import graft.streaming.KafkaCdc

/** Opt-in end-to-end test of the Kafka CDC transport (VERDICT r4 item 5;
  * reference kafka.rs:98-210 poll loop): proves the OPTION WIRING —
  * startingOffsets, maxOffsetsPerTrigger, failOnDataLoss — against a real
  * broker, not just the MemoryStream contract.
  *
  * Gated twice, cancelling (not failing) when the environment can't run
  * it: `GRAFT_KAFKA_BOOTSTRAP` must point at a broker (see
  * integration/docker-compose.kafka.yml) and the runtime-resolved
  * connector + client jars must be on the classpath. The producer side
  * uses kafka-clients REFLECTIVELY so this spec compiles with zero Kafka
  * dependencies, exactly like the production wiring resolves the "kafka"
  * source by name.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private def classPresent(name: String): Boolean =
    try { Class.forName(name); true } catch { case _: Throwable => false }

  private lazy val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")

  private def gate(): String = {
    assume(bootstrap.isDefined,
      "set GRAFT_KAFKA_BOOTSTRAP (integration/docker-compose.kafka.yml)")
    assume(classPresent("org.apache.kafka.clients.producer.KafkaProducer"),
      "kafka-clients not on the classpath")
    assume(classPresent(
      "org.apache.spark.sql.kafka010.KafkaSourceProvider"),
      "spark-sql-kafka-0-10 not on the classpath")
    bootstrap.get
  }

  /** Send (key, value) string records via reflection on kafka-clients. */
  private def produce(servers: String, topic: String,
                      records: Seq[(String, String)]): Unit = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", servers)
    props.put("key.serializer",
      "org.apache.kafka.common.serialization.StringSerializer")
    props.put("value.serializer",
      "org.apache.kafka.common.serialization.StringSerializer")
    val producerCls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    val recordCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    val producer = producerCls.getConstructor(classOf[java.util.Properties])
      .newInstance(props)
    try {
      val send = producerCls.getMethod("send", recordCls)
      records.foreach { case (k, v) =>
        val rec = recordCls
          .getConstructor(classOf[String], classOf[Object], classOf[Object])
          .newInstance(topic, k, v)
        send.invoke(producer, rec.asInstanceOf[Object])
      }
      producerCls.getMethod("flush").invoke(producer)
    } finally producerCls.getMethod("close").invoke(producer)
  }

  test("kafka source end-to-end: earliest offsets, bounded triggers, CDC apply") {
    val servers = gate()
    val topic = s"graft-it-${java.util.UUID.randomUUID().toString.take(8)}"
    // 6 debezium envelopes ({before, after, op, ts_ms}, debezium.rs):
    // 4 inserts, 1 update, 1 delete
    val events = Seq(
      "1" -> """{"op":"c","after":{"id":1,"v":"a"},"ts_ms":1}""",
      "2" -> """{"op":"c","after":{"id":2,"v":"b"},"ts_ms":2}""",
      "3" -> """{"op":"c","after":{"id":3,"v":"c"},"ts_ms":3}""",
      "1" -> """{"op":"u","after":{"id":1,"v":"a2"},"ts_ms":4}""",
      "4" -> """{"op":"c","after":{"id":4,"v":"d"},"ts_ms":5}""",
      "2" -> """{"op":"d","before":{"id":2,"v":"b"},"ts_ms":6}""")
    produce(servers, topic, events)

    // startingOffsets=earliest must replay the pre-existing records;
    // maxOffsetsPerTrigger=2 forces multiple micro-batches over the 6
    val cfg = KafkaCdc.Config(
      bootstrapServers = servers, topics = Seq(topic),
      startingOffsets = "earliest", maxOffsetsPerTrigger = Some(2L),
      failOnDataLoss = false)
    val decoded = KafkaCdc.source(spark, cfg)
    val q = decoded.writeStream.format("memory")
      .queryName("kafka_it").outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("kafka_it").count() < events.size &&
        System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
      }
      val got = spark.table("kafka_it")
      assert(got.count() == events.size)
      assert(got.select("topic").distinct().head().getString(0) == topic)
      // full downstream path: parse + batch apply ends at the right state
      import org.apache.spark.sql.types._
      val payload = StructType(Seq(
        StructField("id", LongType), StructField("v", StringType)))
      val parsed = graft.streaming.Streams
        .parseDebezium(got, col("json"), payload)
        .withColumn("document_key", col("row.id").cast("string"))
      val state0 = parsed.filter(lit(false))
        .select(col("document_key").as("id"), col("row"))
      val end = KafkaCdc.applyCdcBatch(state0, parsed, "id")
      val byId = end.select(col("id"), col("row.v"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(byId.keySet == Set("1", "3", "4")) // 2 deleted
      assert(byId("1") == "a2")                 // last-wins update applied
    } finally q.stop()
  }
}
