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
