package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.ops.Transactions._
import graft.ops.Transactions.TxOperation._

/** Model-based property test for the transaction engine: 40 seeded
  * random transactions (up to 12 ops each, two collections, a small hot
  * id space to force insert-conflicts / missing-id failures and
  * intra-tx chains) replayed against a plain in-memory map model with
  * the reference semantics (vector_transactions.rs apply_operation:
  * insert conflicts on existing, update/delete require existence,
  * upsert always lands, ops see earlier ops in the same tx). After
  * every commit/abort the DataFrame registry must equal the model
  * exactly — ids, vectors, metadata — and a failed transaction must
  * leave the registry at the model's pre-transaction state
  * (all-or-nothing, no partial prefix).
  */
class TransactionsModelSpec extends SparkSpec {
  import spark.implicits._

  private type Model = mutable.Map[(String, String), (Seq[Float], Option[String])]

  private def registryState(m: TransactionManager,
                            colls: Seq[String]): Map[(String, String), (Seq[Float], Option[String])] =
    colls.flatMap { c =>
      m.collection(c).collect().map { r =>
        (c, r.getString(0)) -> (r.getSeq[Float](1), Option(r.getString(2)))
      }
    }.toMap

  test("40 random transactions match the map model exactly; failures " +
      "leave no partial prefix") {
    val rnd = new scala.util.Random(20260814)
    val colls = Seq("a", "b")
    val m = new TransactionManager(spark, TxConfig(), () => 1L)
    val model: Model = mutable.Map.empty
    colls.foreach { c =>
      val seed = (0 until 6).map(i =>
        (s"id$i", Array(i.toFloat, (i * 2).toFloat), s"m$i"))
      m.register(c, seed.map(t => (t._1, t._2, t._3))
        .toDF("id", "vector", "metadata"))
      seed.foreach(t => model((c, t._1)) = (t._2.toSeq, Some(t._3)))
    }

    def randomOp(): TxOperation = {
      val c = colls(rnd.nextInt(2))
      val id = s"id${rnd.nextInt(10)}" // hot space: collisions guaranteed
      val v = Array(rnd.nextInt(100).toFloat, rnd.nextInt(100).toFloat)
      val meta = if (rnd.nextBoolean()) Some(s"x${rnd.nextInt(5)}") else None
      rnd.nextInt(4) match {
        case 0 => Insert(c, id, v, meta)
        case 1 => Update(c, id, v, meta)
        case 2 => Delete(c, id)
        case 3 => Upsert(c, id, v, meta)
      }
    }

    // reference apply_operation semantics over the model; None = failure
    def applyModel(s: Model, op: TxOperation): Boolean = op match {
      case Insert(c, id, v, meta) =>
        if (s.contains((c, id))) false
        else { s((c, id)) = (v.toSeq, meta); true }
      case Update(c, id, v, meta) =>
        if (!s.contains((c, id))) false
        else { s((c, id)) = (v.toSeq, meta); true }
      case Delete(c, id) =>
        if (!s.contains((c, id))) false
        else { s.remove((c, id)); true }
      case Upsert(c, id, v, meta) =>
        s((c, id)) = (v.toSeq, meta); true
    }

    var commits = 0
    var failures = 0
    (1 to 40).foreach { i =>
      // alternate short txs (commit-likely) and long ones (failure-likely)
      val len = if (i % 2 == 0) 1 + rnd.nextInt(3) else 1 + rnd.nextInt(12)
      val ops = (1 to len).map(_ => randomOp())
      // dry-run the model on a copy: does this tx succeed?
      val scratch: Model = model.clone()
      val ok = ops.forall(applyModel(scratch, _))
      val tx = m.begin()
      ops.foreach(m.addOperation(tx, _))
      if (ok) {
        val receipt = m.commit(tx)
        assert(receipt.operationsApplied == ops.size)
        model.clear(); model ++= scratch
        commits += 1
      } else {
        intercept[TxError](m.commit(tx))
        failures += 1
        // all-or-nothing: the registry must still match the PRE-tx model
      }
      assert(registryState(m, colls) == model.toMap)
    }
    // the hot id space must have exercised both paths
    assert(commits >= 5, s"only $commits commits")
    assert(failures >= 5, s"only $failures failures")
  }
}
