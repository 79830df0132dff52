package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-collection transactions (reference:
  * src/services/compute/vector_transactions.rs): begin / buffered
  * operations / commit / abort with per-op undo journal, timeouts, and
  * an operation cap.
  *
  * Operation semantics match the reference exactly: Insert fails on an
  * existing id, Update and Delete require the id to exist (the failure
  * message names the 0-based failing operation), Upsert takes either
  * branch, and operations within a transaction see the effects of
  * earlier operations (insert x then update x is valid). The journal
  * records the same undo shapes (DeleteVector / RestoreVector /
  * RestoreOriginal) captured from the pre-op state.
  *
  * Spark re-expression — and one deliberate improvement: the reference
  * applies operations one by one against the live store and UNDOES the
  * applied prefix when one fails, so a concurrent reader can observe the
  * partial prefix. Here a commit gathers the touched ids per collection
  * with ONE pushed `isin` scan each (operations are capped, so the id
  * list is bounded), replays the operation sequence against that
  * driver-side snapshot to validate and to build the journal, derives
  * each collection's next DataFrame as one anti-join ∪ literal-rows
  * transformation, and only then swaps the registry pointers — all
  * collections move together or not at all. Immutable DataFrames make
  * the rollback path vanish: an aborted commit simply never publishes.
  */
object Transactions {

  final case class TxId(value: Long) {
    override def toString: String = s"vtx-$value"
  }

  sealed trait TxStatus
  object TxStatus {
    case object Active extends TxStatus
    case object Committed extends TxStatus
    case object Aborted extends TxStatus
    case object TimedOut extends TxStatus
  }

  sealed trait TxOperation {
    def collection: String
    def id: String
  }
  object TxOperation {
    final case class Insert(collection: String, id: String,
                            vector: Array[Float],
                            metadata: Option[String] = None) extends TxOperation
    final case class Update(collection: String, id: String,
                            vector: Array[Float],
                            metadata: Option[String] = None) extends TxOperation
    final case class Delete(collection: String, id: String) extends TxOperation
    final case class Upsert(collection: String, id: String,
                            vector: Array[Float],
                            metadata: Option[String] = None) extends TxOperation
  }

  sealed trait UndoRecord
  object UndoRecord {
    final case class DeleteVector(collection: String, id: String)
      extends UndoRecord
    final case class RestoreVector(collection: String, id: String,
                                   vector: Array[Float],
                                   metadata: Option[String]) extends UndoRecord
    final case class RestoreOriginal(collection: String, id: String,
                                     vector: Array[Float],
                                     metadata: Option[String]) extends UndoRecord
  }

  final case class JournalEntry(txId: TxId, sequence: Long, op: TxOperation,
                                undo: Option[UndoRecord], timestamp: Long)

  final case class CommitReceipt(txId: TxId, operationsApplied: Int,
                                 collectionsAffected: Seq[String],
                                 applyDurationMs: Long, committedAt: Long)

  final case class TxConfig(maxOperations: Int = 10000,
                            timeoutMs: Long = 30000,
                            maxConcurrent: Int = 64,
                            enableJournal: Boolean = true)

  final case class TxError(message: String) extends RuntimeException(message)

  private final class Tx(val id: TxId, val startedAt: Long,
                         val timeoutMs: Long) {
    var status: TxStatus = TxStatus.Active
    val operations = mutable.Buffer.empty[TxOperation]
    def isExpired(now: Long): Boolean = now - startedAt > timeoutMs
  }

  private val rowSchema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("vector", ArrayType(FloatType), nullable = false),
    StructField("metadata", StringType, nullable = true)))

  final class TransactionManager(spark: SparkSession,
                                 config: TxConfig = TxConfig(),
                                 val now: () => Long =
                                   () => System.currentTimeMillis()) {
    private val registry = mutable.LinkedHashMap.empty[String, DataFrame]
    private val txs = mutable.LinkedHashMap.empty[TxId, Tx]
    private val journalLog = mutable.Buffer.empty[JournalEntry]
    private var nextId = 1L

    /** Register a (id, vector, metadata) collection DataFrame. */
    def register(name: String, df: DataFrame): this.type = synchronized {
      registry(name) = df.select(
        col("id").cast("string").as("id"),
        col("vector").cast("array<float>").as("vector"),
        (if (df.columns.contains("metadata")) col("metadata").cast("string")
         else lit(null).cast("string")).as("metadata"))
      this
    }

    def collection(name: String): DataFrame = synchronized {
      registry.getOrElse(name,
        throw TxError(s"Collection not found: $name"))
    }

    def begin(): TxId = synchronized {
      gcTimedOut()
      // Deliberate divergence: the reference declares max_concurrent in
      // its config but never enforces it (vector_transactions.rs), so
      // its begin() never throws for this reason. An unenforced cap is
      // dead config; here it is a real limit.
      val active = txs.values.count(_.status == TxStatus.Active)
      if (active >= config.maxConcurrent)
        throw TxError(
          s"Too many concurrent transactions (max ${config.maxConcurrent})")
      val id = TxId(nextId); nextId += 1
      txs(id) = new Tx(id, now(), config.timeoutMs)
      id
    }

    def addOperation(txId: TxId, op: TxOperation): Unit = synchronized {
      val tx = txs.getOrElse(txId,
        throw TxError(s"Transaction $txId not found"))
      if (tx.status != TxStatus.Active)
        throw TxError(s"Transaction $txId is ${tx.status}, cannot add operations")
      if (tx.isExpired(now())) {
        tx.status = TxStatus.TimedOut
        throw TxError(s"Transaction $txId timed out")
      }
      if (tx.operations.size >= config.maxOperations)
        throw TxError(
          s"Transaction $txId exceeds max operations (${config.maxOperations})")
      tx.operations += op
      ()
    }

    def abort(txId: TxId): Unit = synchronized {
      val tx = txs.getOrElse(txId,
        throw TxError(s"Transaction $txId not found"))
      if (tx.status != TxStatus.Active)
        throw TxError(s"Transaction $txId is ${tx.status}, cannot abort")
      tx.status = TxStatus.Aborted
    }

    def status(txId: TxId): Option[TxStatus] =
      synchronized(txs.get(txId).map(_.status))
    def activeCount: Int =
      synchronized(txs.values.count(_.status == TxStatus.Active))
    def journalEntries(txId: TxId): Seq[JournalEntry] =
      synchronized(journalLog.filter(_.txId == txId).toSeq)
    def gc(): Unit =
      synchronized(txs.filterInPlace((_, tx) => tx.status == TxStatus.Active))
    private def gcTimedOut(): Unit =
      txs.values.foreach { tx =>
        if (tx.status == TxStatus.Active && tx.isExpired(now()))
          tx.status = TxStatus.TimedOut
      }

    /** Validate + derive + swap. All collections publish together or the
      * registry is untouched (the reference rolls back an applied prefix
      * instead; see the object scaladoc).
      */
    def commit(txId: TxId): CommitReceipt = synchronized {
      val tx = txs.getOrElse(txId,
        throw TxError(s"Transaction $txId not found"))
      if (tx.status != TxStatus.Active)
        throw TxError(s"Transaction $txId is ${tx.status}, cannot commit")
      if (tx.isExpired(now())) {
        tx.status = TxStatus.TimedOut
        throw TxError(s"Transaction $txId timed out")
      }
      val t0 = now()
      val ops = tx.operations.toSeq
      // one bounded pushed scan per touched collection: current rows of
      // the ids this transaction touches
      val touched: Map[String, Seq[String]] =
        ops.groupBy(_.collection).view.mapValues(_.map(_.id).distinct)
          .toMap
      touched.keys.foreach(c =>
        if (!registry.contains(c)) {
          tx.status = TxStatus.Aborted
          throw TxError(s"Collection not found: $c")
        })
      val snapshot: mutable.Map[(String, String), (Array[Float], Option[String])] =
        mutable.Map.empty
      touched.foreach { case (c, ids) =>
        registry(c).filter(col("id").isin(ids: _*)).collect().foreach { r =>
          snapshot((c, r.getString(0))) =
            (r.getSeq[Float](1).toArray, Option(r.getString(2)))
        }
      }
      // sequential replay against the snapshot: validation + journal
      import TxOperation._
      import UndoRecord._
      val journal = mutable.Buffer.empty[JournalEntry]
      def fail(tx0: Tx, seq: Int, reason: String): Nothing = {
        tx0.status = TxStatus.Aborted
        throw TxError(s"Transaction $txId failed at operation $seq: $reason")
      }
      ops.zipWithIndex.foreach { case (op, seq) =>
        val key = (op.collection, op.id)
        val existing = snapshot.get(key)
        val undo: Option[UndoRecord] = op match {
          case Insert(c, id, v, m) =>
            if (existing.isDefined)
              fail(tx, seq, s"Vector id already exists: $id")
            snapshot(key) = (v, m)
            Some(DeleteVector(c, id))
          case Update(c, id, v, m) =>
            existing match {
              case Some((ov, om)) =>
                snapshot(key) = (v, m)
                Some(RestoreOriginal(c, id, ov, om))
              case None => fail(tx, seq, s"Vector not found: $id")
            }
          case Delete(c, id) =>
            existing match {
              case Some((ov, om)) =>
                snapshot.remove(key)
                Some(RestoreVector(c, id, ov, om))
              case None => fail(tx, seq, s"Vector not found: $id")
            }
          case Upsert(c, id, v, m) =>
            val u = existing match {
              case Some((ov, om)) => RestoreVector(c, id, ov, om)
              case None => DeleteVector(c, id)
            }
            snapshot(key) = (v, m)
            Some(u)
        }
        journal += JournalEntry(txId, seq.toLong, op, undo, now())
      }
      // derive each touched collection's next DataFrame, then swap all
      val nextDfs = touched.map { case (c, ids) =>
        val finalRows = ids.flatMap(id => snapshot.get((c, id)).map {
          case (v, m) => Row(id, v.toSeq, m.orNull)
        })
        val incoming = spark.createDataFrame(
          new java.util.ArrayList[Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(finalRows).asJava),
          rowSchema)
        val next = registry(c).filter(!col("id").isin(ids: _*))
          .unionByName(incoming)
          .localCheckpoint(false) // O(1) lineage across commits
        c -> next
      }
      nextDfs.foreach { case (c, df) => registry(c) = df }
      tx.status = TxStatus.Committed
      if (config.enableJournal) journalLog ++= journal
      CommitReceipt(txId, ops.size,
        touched.keys.toSeq.sorted, now() - t0, now())
    }
  }
}
