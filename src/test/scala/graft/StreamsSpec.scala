package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Streams

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def log = Seq(
    (1L, "insert", "c1", "a", """{"v":1}"""),
    (2L, "insert", "c1", "b", """{"v":2}"""),
    (3L, "update", "c1", "a", """{"v":3}"""),
    (4L, "delete", "c1", "b", null.asInstanceOf[String]),
    (5L, "insert", "c2", "x", """{"v":9}""")
  ).toDF("seq", "op", "collection", "id", "metadata")

  test("change feed: resume token + op/collection filters") {
    assert(Streams.changes(log, resumeAfter = Some(2L)).count() == 3)
    assert(Streams.changes(log, ops = Seq("insert")).count() == 3)
    assert(Streams.changes(log, collection = Some("c1")).count() == 4)
    assert(Streams.changes(log, resumeAfter = Some(2L), ops = Seq("delete"))
      .select("id").as[String].collect().toSeq == Seq("b"))
  }

  test("replay folds the log into current state (deletes drop rows)") {
    val state = Streams.replay(log)
      .select("id", "metadata").as[(String, String)].collect().toMap
    assert(state.keySet == Set("a", "x"))
    assert(state("a") == """{"v":3}""") // update won over insert
  }

  test("log compaction keeps latest event per key") {
    val compacted = Streams.compactLog(log)
    assert(compacted.count() == 3)
    assert(compacted.filter(col("id") === "b").select("op").as[String].head() == "delete")
  }

  test("debezium envelope parsing") {
    val payload = StructType(Seq(StructField("pk", LongType),
      StructField("val", StringType)))
    val envs = Seq(
      """{"op":"c","after":{"pk":1,"val":"x"},"ts_ms":100}""",
      """{"op":"u","before":{"pk":1,"val":"x"},"after":{"pk":1,"val":"y"},"ts_ms":200}""",
      """{"op":"d","before":{"pk":1,"val":"y"},"ts_ms":300}""").toDF("json")
    val got = Streams.parseDebezium(envs, col("json"), payload)
      .select(col("op"), col("row.pk"), col("row.val"))
      .as[(String, Long, String)].collect().toSeq
    assert(got == Seq(("insert", 1L, "x"), ("update", 1L, "y"), ("delete", 1L, "y")))
  }

  test("mongo change-stream envelope parsing (mongodb.rs:65-130)") {
    val events = Seq(
      """{"operationType":"insert","ns":{"db":"d","coll":"docs"},"documentKey":{"_id":"a"},"clusterTime":100,"fullDocument":"{\"x\":1}"}""",
      """{"operationType":"replace","ns":{"db":"d","coll":"docs"},"documentKey":{"_id":"b"},"clusterTime":101,"fullDocument":"{\"x\":2}"}""",
      """{"operationType":"delete","ns":{"db":"d","coll":"docs"},"documentKey":{"_id":"a"},"clusterTime":102,"fullDocumentBeforeChange":"{\"x\":1}"}""",
      """{"operationType":"dropDatabase","clusterTime":103}""",
      """{"operationType":"weird","clusterTime":104}""").toDF("json")
    val got = Streams.parseMongoChangeStream(events, col("json"))
      .select("op", "collection", "document_key", "ts_ms")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), r.getLong(3)))
    assert(got.length == 4) // unknown op dropped
    assert(got(0) == (("insert", "docs", Some("a"), 100000L)))
    assert(got(1)._1 == "update") // replace normalizes to update
    assert(got(2)._1 == "delete")
    assert(got(3) == (("drop", "unknown", None, 103000L)))
  }

  test("postgres logical text format parsing with table mapping (postgres.rs:71)") {
    val msgs = Seq(
      """I{"table":"t_docs","id":"1","x":5}""",
      """U{"table":"t_docs","id":"1","x":6}""",
      """D{"table":"other","id":"9"}""").toDF("m")
    val got = Streams.parsePgLogical(msgs, col("m"),
      collectionMapping = Map("t_docs" -> "docs"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("insert", "docs", "1"), ("update", "docs", "1"), ("delete", "other", "9")))
  }

  test("streaming dedup drops cross-batch duplicates with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val out = Streams.streamingDedup(
      input.toDF().toDF("event_time", "fp", "payload"),
      "fp", "event_time", "10 seconds")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      input.addData((ts(1), "a", "v1"), (ts(2), "a", "v1-dup"), (ts(3), "b", "v2"))
      q.processAllAvailable()
      // duplicate in a LATER batch is still dropped (state persists)
      input.addData((ts(4), "a", "v1-dup2"), (ts(5), "c", "v3"))
      q.processAllAvailable()
      val got = spark.table("sdedup").select("fp", "payload")
        .as[(String, String)].collect().toMap
      assert(got.keySet == Set("a", "b", "c"))
      assert(got("a") == "v1") // first occurrence wins
    } finally q.stop()
  }

  test("Kafka CDC contract: decode → parse → per-batch apply from a MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    // MemoryStream shaped like a Kafka frame (topic/key/value) stands in
    // for the live source — everything downstream (KafkaCdc.decode →
    // parsePgLogical → applyCdcBatch) is the exact path a topic would feed
    val input = MemoryStream[(String, String, String)]
    val kafkaShaped = input.toDF().toDF("topic", "key", "value")
    val initial = Seq(("0", """{"table":"t","id":"0","x":0}"""))
      .toDF("id", "row")
    var latest = initial
    val ckpt = java.nio.file.Files.createTempDirectory("graft-kcdc").toString
    val q = graft.streaming.KafkaCdc.runIngest(
      graft.streaming.KafkaCdc.decode(kafkaShaped), ckpt, initial)(
      (df, c) => graft.streaming.Streams.parsePgLogical(df, c))(
      df => latest = df)
    try {
      input.addData(
        ("cdc", "1", """I{"table":"t","id":"1","x":1}"""),
        ("cdc", "2", """I{"table":"t","id":"2","x":2}"""))
      q.processAllAvailable()
      assert(latest.select("id").as[String].collect().toSet == Set("0", "1", "2"))
      input.addData(
        ("cdc", "1", """U{"table":"t","id":"1","x":10}"""),
        ("cdc", "2", """D{"table":"t","id":"2"}"""))
      q.processAllAvailable()
      val m = latest.select("id", "row").as[(String, String)].collect().toMap
      assert(m.keySet == Set("0", "1"))
      assert(m("1").contains("\"x\":10"))
    } finally q.stop()
  }

  test("kafka source wiring fails only on the absent connector, not our code") {
    // the sandbox has no spark-sql-kafka jar: building the source must
    // fail with the unresolvable-DataSource error (i.e. the option wiring
    // itself is sound and would bind against a real classpath)
    val e = intercept[Exception] {
      graft.streaming.KafkaCdc.source(spark,
        graft.streaming.KafkaCdc.Config("localhost:9092", Seq("cdc")))
    }
    val msg = e.toString.toLowerCase
    assert(msg.contains("kafka") || msg.contains("data source"), msg)
  }

  test("pg table mapping applies independently, never transitively") {
    // regression: {"a"->"b", "b"->"c"} folded over the remapped value sent
    // table 'a' to 'c' depending on Map iteration order
    val msgs = Seq(
      """I{"table":"a","id":"1"}""",
      """I{"table":"b","id":"2"}""",
      """I{"table":"c","id":"3"}""").toDF("m")
    val got = Streams.parsePgLogical(msgs, col("m"),
      collectionMapping = scala.collection.immutable.ListMap("a" -> "b", "b" -> "c"))
      .select("collection").as[String].collect().toSeq
    assert(got == Seq("b", "c", "c"))
  }

  test("watermarked tumbling-window counts finalize windows and drop late events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val agg = Streams.windowedCounts(
      input.toDF().toDF("event_time", "collection"),
      "event_time", "collection", "10 seconds", "5 seconds")
    val q = agg.writeStream.format("memory").queryName("wincounts")
      .outputMode("append").start()
    try {
      input.addData((ts(1), "docs"), (ts(3), "docs"), (ts(7), "imgs"))
      q.processAllAvailable()
      // advance the watermark past window [0,10): events at t=21 put the
      // watermark at 16 → the first window finalizes
      input.addData((ts(21), "docs"))
      q.processAllAvailable()
      // a late event inside the finalized window must be DROPPED
      input.addData((ts(2), "docs"))
      q.processAllAvailable()
      input.addData((ts(35), "docs"))
      q.processAllAvailable()
      val rows = spark.table("wincounts")
        .select("window_start", "collection", "n")
        .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getLong(2)))
        .toSet
      assert(rows.contains((0L, "docs", 2L)))  // t=1,3 — late t=2 NOT counted
      assert(rows.contains((0L, "imgs", 1L)))
      assert(rows.contains((20L, "docs", 1L))) // t=21, finalized by t=35
    } finally q.stop()
  }

  test("streaming ingest upserts each micro-batch with checkpointed offsets") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val initial = Seq(("a", 1.0)).toDF("id", "value")
    @volatile var latest: org.apache.spark.sql.DataFrame = initial
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = Streams.ingestUpsert(
      input.toDF().toDF("id", "value"), "id", ckpt, initial)(df => latest = df)
    try {
      input.addData(("a", 5.0), ("b", 2.0))
      q.processAllAvailable()
      val m1 = latest.as[(String, Double)].collect().toMap
      assert(m1 == Map("a" -> 5.0, "b" -> 2.0))
      input.addData(("c", 3.0))
      q.processAllAvailable()
      val m2 = latest.as[(String, Double)].collect().toMap
      assert(m2 == Map("a" -> 5.0, "b" -> 2.0, "c" -> 3.0))
    } finally q.stop()
  }
}
