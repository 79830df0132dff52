package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Event triggers (SURVEY.md §2.11 gap item; reference:
  * src/experimental/triggers.rs — TriggerEvent :29-92, TriggerFilter
  * :106-149, LoggingTrigger :151-220, WebhookTrigger :222-326,
  * TriggerRegistry + dead-letter queue + metrics :454-556).
  *
  * Spark shape: the change feed (a streaming DataFrame of normalized
  * change events) drives a `foreachBatch` hook — [[attach]] — that fires
  * registered triggers per event. The registry's combined filter is
  * compiled to a Catalyst predicate and applied to the micro-batch FIRST,
  * so only matching events (typically a tiny fraction) ever reach the
  * driver-side hooks; non-matching events are filtered distributedly.
  * Hooks themselves are driver-side by design — they are side-effects
  * (logs, webhooks, view refreshes), the same role they play in the
  * reference's registry.
  */
object Triggers {

  /** Normalized event (triggers.rs:29-92); `count` > 1 for batch events. */
  final case class TriggerEvent(op: String, collection: String,
                                id: String, count: Long = 1L)

  /** Empty set = match all (triggers.rs:124-135). */
  final case class TriggerFilter(eventTypes: Set[String] = Set.empty,
                                 collections: Set[String] = Set.empty) {
    def matches(e: TriggerEvent): Boolean =
      (eventTypes.isEmpty || eventTypes(e.op)) &&
        (collections.isEmpty || collections(e.collection))

    /** The same predicate as a Catalyst column (pushed into the batch). */
    def toColumn: Column = {
      val t = if (eventTypes.isEmpty) lit(true)
              else col("op").isin(eventTypes.toSeq: _*)
      val c = if (collections.isEmpty) lit(true)
              else col("collection").isin(collections.toSeq: _*)
      t && c
    }
  }

  sealed trait TriggerResult
  case object Success extends TriggerResult
  final case class Error(message: String) extends TriggerResult
  case object Skipped extends TriggerResult

  /** triggers.rs VectorTrigger trait. */
  trait VectorTrigger {
    def name: String
    def filter: TriggerFilter
    def fire(event: TriggerEvent): TriggerResult
    def isEnabled: Boolean = true
  }

  /** In-memory event log (triggers.rs:151-220). */
  final class LoggingTrigger(val name: String,
                             val filter: TriggerFilter = TriggerFilter())
      extends VectorTrigger {
    private val log = mutable.ArrayBuffer[(Long, String)]()
    def fire(e: TriggerEvent): TriggerResult = synchronized {
      log += ((System.currentTimeMillis(),
        s"[${e.op}] ${e.collection}/${e.id}"))
      Success
    }
    def entries: Seq[(Long, String)] = synchronized(log.toSeq)
    def clear(): Unit = synchronized(log.clear())
  }

  /** Queues webhook payloads for delivery (triggers.rs:222-326 — the
    * reference also only queues unless its HTTP feature is compiled in;
    * a delivery loop drains [[drainPending]]).
    */
  final class WebhookTrigger(val name: String, val url: String,
                             val filter: TriggerFilter = TriggerFilter())
      extends VectorTrigger {
    final case class Payload(url: String, eventType: String,
                             collection: String, id: String, ts: Long)
    private val pending = mutable.Queue[Payload]()
    def fire(e: TriggerEvent): TriggerResult = synchronized {
      pending += Payload(url, e.op, e.collection, e.id,
        System.currentTimeMillis())
      Success
    }
    def pendingCount: Int = synchronized(pending.size)
    def drainPending(): Seq[Payload] = synchronized {
      val out = pending.toSeq; pending.clear(); out
    }
  }

  final case class DeadLetterEntry(triggerName: String, event: TriggerEvent,
                                   error: String, timestamp: Long)
  final case class Metrics(eventsProcessed: Long, successes: Long,
                           failures: Long, skipped: Long)

  /** Registry with dead-letter queue and metrics (triggers.rs:454-556). */
  final class TriggerRegistry(maxDeadLetters: Int = 10000) {
    private val triggers = mutable.ArrayBuffer[VectorTrigger]()
    private val dlq = mutable.Queue[DeadLetterEntry]()
    private var processed = 0L; private var ok = 0L
    private var failed = 0L; private var skip = 0L

    def register(t: VectorTrigger): this.type = synchronized {
      triggers += t; this
    }
    def unregister(name: String): Boolean = synchronized {
      val before = triggers.size
      triggers.filterInPlace(_.name != name)
      triggers.size < before
    }
    def listTriggers: Seq[String] = synchronized(triggers.map(_.name).toSeq)

    /** Fire all matching triggers; errors go to the bounded DLQ. */
    def fire(event: TriggerEvent): Unit = synchronized {
      processed += 1
      triggers.foreach { t =>
        if (!t.isEnabled) ()
        else if (!t.filter.matches(event)) skip += 1
        else scala.util.Try(t.fire(event)).recover { case e =>
          Error(e.getMessage)
        }.get match {
          case Success => ok += 1
          case Skipped => skip += 1
          case Error(msg) =>
            failed += 1
            if (dlq.size >= maxDeadLetters) dlq.dequeue()
            dlq += DeadLetterEntry(t.name, event, msg,
              System.currentTimeMillis() / 1000)
        }
      }
    }

    def deadLetters: Seq[DeadLetterEntry] = synchronized(dlq.toSeq)
    def clearDeadLetters(): Unit = synchronized(dlq.clear())
    def metrics: Metrics = synchronized(Metrics(processed, ok, failed, skip))

    /** OR of every enabled trigger's filter — the distributed pre-filter.
      * No triggers (or none enabled) → nothing reaches the driver.
      */
    def batchPredicate: Column = synchronized {
      val enabled = triggers.filter(_.isEnabled)
      if (enabled.isEmpty) lit(false)
      else enabled.map(_.filter.toColumn).reduce(_ || _)
    }

    /** Fire this registry from one micro-batch of change events
      * ((op, collection, id) columns): the combined filter prunes
      * distributedly, then only the surviving events are collected and
      * fired in order.
      */
    def fireBatch(events: DataFrame): Unit = {
      val matching = events.filter(batchPredicate)
        .select(col("op").cast("string"), col("collection").cast("string"),
          col("id").cast("string"))
        .collect()
      matching.foreach(r =>
        fire(TriggerEvent(r.getString(0), r.getString(1), r.getString(2))))
    }
  }

  /** Hook a registry onto a streaming change feed: every micro-batch
    * fires matching triggers (the reference fires synchronously on each
    * mutation; foreachBatch is the streaming-native equivalent).
    */
  def attach(changeStream: DataFrame, registry: TriggerRegistry,
             checkpointDir: String): StreamingQuery =
    changeStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        registry.fireBatch(batch)
      }
      .start()

  /** Bridges triggers to view maintenance: any matching event marks the
    * view stale and refreshes it when older than `maxAgeMs` — unifying the
    * materialized-view staleness refresh (Compiler.refreshViewIfStale)
    * with the trigger surface.
    */
  final class ViewRefreshTrigger(session: graft.needleql.NeedleSession,
                                 viewName: String, maxAgeMs: Long,
                                 val filter: TriggerFilter = TriggerFilter())
      extends VectorTrigger {
    val name = s"view-refresh:$viewName"
    def fire(e: TriggerEvent): TriggerResult =
      if (session.refreshViewIfStale(viewName, maxAgeMs)) Success
      else Skipped
  }
}
