package graft

import org.apache.spark.sql.functions._

import graft.ops.Transactions._
import graft.ops.Transactions.TxOperation._

/** Transaction manager vs vector_transactions.rs: lifecycle, operation
  * semantics (insert-conflict, update/delete-require-existence, upsert,
  * intra-tx visibility), undo journal shapes, timeout, caps, and the
  * atomic all-or-nothing registry swap.
  */
class TransactionsSpec extends SparkSpec {
  import spark.implicits._

  private def mgr(cfg: TxConfig = TxConfig(), t0: Long = 1000L) = {
    var clock = t0
    val m = new TransactionManager(spark, cfg, () => clock)
    m.register("a", Seq(
      ("x", Array(1f, 0f), "mx"), ("y", Array(0f, 1f), "my"))
      .toDF("id", "vector", "metadata"))
    m.register("b", Seq(("z", Array(1f, 1f), "mz"))
      .toDF("id", "vector", "metadata"))
    (m, (d: Long) => clock += d)
  }

  private def ids(m: TransactionManager, c: String): Set[String] =
    m.collection(c).select("id").as[String].collect().toSet

  test("commit applies a multi-collection batch atomically with a " +
      "receipt and journal") {
    val (m, _) = mgr()
    val tx = m.begin()
    m.addOperation(tx, Insert("a", "w", Array(2f, 2f), Some("mw")))
    m.addOperation(tx, Update("a", "x", Array(3f, 3f), Some("mx2")))
    m.addOperation(tx, Delete("a", "y"))
    m.addOperation(tx, Upsert("b", "z", Array(4f, 4f), None))
    m.addOperation(tx, Upsert("b", "q", Array(5f, 5f), None))
    val receipt = m.commit(tx)
    assert(receipt.operationsApplied == 5)
    assert(receipt.collectionsAffected == Seq("a", "b"))
    assert(m.status(tx).contains(TxStatus.Committed))
    assert(ids(m, "a") == Set("w", "x"))
    assert(ids(m, "b") == Set("z", "q"))
    val updated = m.collection("a").filter(col("id") === "x").head()
    assert(updated.getString(2) == "mx2")
    // journal: undo shapes captured from pre-op state, in sequence order
    val j = m.journalEntries(tx)
    assert(j.map(_.sequence) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(j(0).undo.contains(UndoRecord.DeleteVector("a", "w")))
    assert(j(1).undo.exists {
      case UndoRecord.RestoreOriginal("a", "x", v, Some("mx")) =>
        v.toSeq == Seq(1f, 0f)
      case _ => false
    })
    assert(j(2).undo.exists {
      case UndoRecord.RestoreVector("a", "y", _, Some("my")) => true
      case _ => false
    })
    // upsert on existing z restores, on new q deletes
    assert(j(3).undo.exists(_.isInstanceOf[UndoRecord.RestoreVector]))
    assert(j(4).undo.contains(UndoRecord.DeleteVector("b", "q")))
  }

  test("a failing operation aborts the WHOLE transaction — no partial " +
      "state is ever published") {
    val (m, _) = mgr()
    val tx = m.begin()
    m.addOperation(tx, Insert("a", "w", Array(2f, 2f)))
    m.addOperation(tx, Delete("b", "z"))
    m.addOperation(tx, Insert("a", "x", Array(9f, 9f))) // conflict: x exists
    val e = intercept[TxError](m.commit(tx))
    assert(e.message.contains("failed at operation 2"))
    assert(e.message.contains("already exists"))
    assert(m.status(tx).contains(TxStatus.Aborted))
    // neither the insert of w nor the delete of z landed
    assert(ids(m, "a") == Set("x", "y"))
    assert(ids(m, "b") == Set("z"))
    // update/delete on a missing id fail the same way
    val tx2 = m.begin()
    m.addOperation(tx2, Update("a", "ghost", Array(1f, 1f)))
    assert(intercept[TxError](m.commit(tx2)).message
      .contains("failed at operation 0"))
  }

  test("operations see earlier operations in the same transaction") {
    val (m, _) = mgr()
    val tx = m.begin()
    m.addOperation(tx, Insert("a", "n1", Array(1f, 1f)))
    m.addOperation(tx, Update("a", "n1", Array(2f, 2f), Some("u")))
    m.addOperation(tx, Insert("a", "n2", Array(3f, 3f)))
    m.addOperation(tx, Delete("a", "n2"))
    m.commit(tx)
    assert(ids(m, "a") == Set("x", "y", "n1"))
    val n1 = m.collection("a").filter(col("id") === "n1").head()
    assert(n1.getSeq[Float](1) == Seq(2f, 2f) && n1.getString(2) == "u")
  }

  test("lifecycle guards: abort, double-commit, unknown tx, op cap, " +
      "timeout") {
    val (m, tick) = mgr(TxConfig(maxOperations = 2, timeoutMs = 100))
    val tx = m.begin()
    m.addOperation(tx, Insert("a", "p", Array(1f, 1f)))
    m.abort(tx)
    assert(m.status(tx).contains(TxStatus.Aborted))
    assert(intercept[TxError](m.commit(tx)).message.contains("Aborted"))
    assert(intercept[TxError](
      m.addOperation(tx, Delete("a", "x"))).message.contains("Aborted"))
    assert(intercept[TxError](
      m.commit(TxId(999))).message.contains("not found"))
    // op cap
    val tx2 = m.begin()
    m.addOperation(tx2, Insert("a", "p1", Array(1f, 1f)))
    m.addOperation(tx2, Insert("a", "p2", Array(1f, 1f)))
    assert(intercept[TxError](m.addOperation(tx2,
      Insert("a", "p3", Array(1f, 1f)))).message.contains("max operations"))
    m.abort(tx2)
    // timeout: expiry flips the status and refuses the commit
    val tx3 = m.begin()
    m.addOperation(tx3, Insert("a", "q", Array(1f, 1f)))
    tick(200)
    assert(intercept[TxError](m.commit(tx3)).message.contains("timed out"))
    assert(m.status(tx3).contains(TxStatus.TimedOut))
    assert(m.activeCount == 0)
    m.gc()
    assert(m.status(tx3).isEmpty)
  }

  test("maxConcurrent caps active transactions; abort frees a slot") {
    val (m, _) = mgr(TxConfig(maxConcurrent = 2))
    val t1 = m.begin()
    m.begin()
    assert(intercept[TxError](m.begin()).message
      .contains("Too many concurrent"))
    m.abort(t1)
    m.begin() // slot freed
    assert(m.activeCount == 2)
  }
}
