package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Triggers
import graft.streaming.Triggers._

class TriggersSpec extends SparkSpec {
  import spark.implicits._

  test("filter matches by event type and collection (triggers.rs:124)") {
    val f = TriggerFilter(Set("insert"), Set("docs"))
    assert(f.matches(TriggerEvent("insert", "docs", "v1")))
    assert(!f.matches(TriggerEvent("delete", "docs", "v1")))
    assert(!f.matches(TriggerEvent("insert", "other", "v1")))
    assert(TriggerFilter().matches(TriggerEvent("search", "any", "x")))
  }

  test("logging + webhook triggers record fired events (triggers.rs:557-586)") {
    val logT = new LoggingTrigger("log")
    val whT = new WebhookTrigger("wh", "http://example.com/hook",
      TriggerFilter(eventTypes = Set("delete")))
    val reg = new TriggerRegistry().register(logT).register(whT)
    reg.fire(TriggerEvent("insert", "docs", "v1"))
    reg.fire(TriggerEvent("delete", "docs", "v2"))
    assert(logT.entries.size == 2)
    assert(whT.pendingCount == 1)
    val p = whT.drainPending()
    assert(p.head.eventType == "delete" && p.head.id == "v2")
    assert(whT.pendingCount == 0)
    val m = reg.metrics
    assert(m.eventsProcessed == 2 && m.successes == 3 && m.skipped == 1)
  }

  test("errors land in the bounded dead-letter queue (triggers.rs:515-534)") {
    val bad = new VectorTrigger {
      val name = "bad"; val filter = TriggerFilter()
      def fire(e: TriggerEvent) = Error("boom")
    }
    val reg = new TriggerRegistry(maxDeadLetters = 2).register(bad)
    (1 to 3).foreach(i => reg.fire(TriggerEvent("insert", "c", s"v$i")))
    val dl = reg.deadLetters
    assert(dl.size == 2) // bounded: oldest evicted
    assert(dl.map(_.event.id) == Seq("v2", "v3"))
    assert(reg.metrics.failures == 3)
  }

  test("registry pre-filter prunes the batch before any event is collected") {
    val logT = new LoggingTrigger("log",
      TriggerFilter(eventTypes = Set("insert"), collections = Set("docs")))
    val reg = new TriggerRegistry().register(logT)
    val events = Seq(
      ("insert", "docs", "a"), ("insert", "other", "b"),
      ("delete", "docs", "c"), ("insert", "docs", "d"))
      .toDF("op", "collection", "id")
    // the predicate is a real Catalyst filter on the batch
    assert(events.filter(reg.batchPredicate).count() == 2)
    reg.fireBatch(events)
    assert(logT.entries.size == 2)
    // only matching events were fired — metrics see no skips
    assert(reg.metrics.eventsProcessed == 2 && reg.metrics.skipped == 0)
  }

  test("triggers fire from a streaming MemoryStream micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val logT = new LoggingTrigger("log",
      TriggerFilter(eventTypes = Set("insert", "delete")))
    val reg = new TriggerRegistry().register(logT)
    val input = MemoryStream[(String, String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-trig").toString
    val q = Triggers.attach(
      input.toDF().toDF("op", "collection", "id"), reg, ckpt)
    try {
      input.addData(("insert", "docs", "v1"), ("update", "docs", "v2"),
        ("delete", "docs", "v3"))
      q.processAllAvailable()
      assert(logT.entries.size == 2) // update filtered out distributedly
      assert(logT.entries.exists(_._2.contains("[insert] docs/v1")))
      assert(logT.entries.exists(_._2.contains("[delete] docs/v3")))
    } finally q.stop()
  }

  test("view-refresh trigger unifies staleness refresh with the registry") {
    val s = new graft.needleql.NeedleSession(spark)
    val docs = Seq(("a", Array(1f, 0f), 1.0)).toDF("id", "vector", "score")
    s.register("docs", graft.needleql.CollectionDef(docs))
    s.sql("CREATE MATERIALIZED VIEW mv AS SELECT id, score FROM docs LIMIT 10")
    val reg = new TriggerRegistry().register(
      new ViewRefreshTrigger(s, "mv", maxAgeMs = 0,
        TriggerFilter(collections = Set("docs"))))
    reg.fire(TriggerEvent("insert", "docs", "z"))
    assert(reg.metrics.successes == 1) // refresh ran
  }
}
