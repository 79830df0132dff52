package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StatefulLww
import graft.streaming.StatefulLww.{Change, Op}

/** Streaming LWW-register state (flatMapGroupsWithState): out-of-order
  * arbitration, takeover-only emission, idempotent redelivery, tombstone
  * changes, and batch-mode parity with the declarative Crdt.converge.
  */
class StatefulLwwSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches(batches: Seq[Op]*): Seq[Seq[Change]] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Op]
    val out = StatefulLww.changes(input.toDS())
    val q = out.writeStream.format("memory").queryName("lww")
      .outputMode("append").start()
    try {
      val seen = Seq.newBuilder[Seq[Change]]
      var prior = 0L
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        val all = spark.table("lww").as[Change].collect()
        seen += all.drop(prior.toInt).toSeq
        prior = all.length
      }
      seen.result()
    } finally q.stop()
  }

  test("out-of-order arrival: late out-ranked op emits nothing, state holds") {
    val got = runBatches(
      Seq(Op("a", 5, 0, "r1", "add", "v5")),
      Seq(Op("a", 3, 0, "r1", "add", "v3")), // late, out-ranked
      Seq(Op("a", 7, 0, "r1", "add", "v7")))
    assert(got(0).map(_.payload) == Seq("v5"))
    assert(got(1).isEmpty, s"late op must not emit: ${got(1)}")
    assert(got(2).map(_.payload) == Seq("v7"))
  }

  test("redelivery of the winning op is idempotent (no emission)") {
    val got = runBatches(
      Seq(Op("a", 5, 0, "r1", "add", "v5")),
      Seq(Op("a", 5, 0, "r1", "add", "v5")))
    assert(got(0).size == 1 && got(1).isEmpty)
  }

  test("delete out-ranks: tombstone change; later out-ranked add ignored") {
    val got = runBatches(
      Seq(Op("a", 5, 0, "r1", "add", "v5")),
      Seq(Op("a", 6, 0, "r1", "delete", "")),
      Seq(Op("a", 4, 0, "r2", "add", "late")))
    assert(got(1).map(c => (c.alive, c.payload)) == Seq((false, "")))
    assert(got(2).isEmpty)
  }

  test("HLC tie-breaks: logical counter, then replica id") {
    val got = runBatches(
      Seq(Op("a", 5, 1, "r1", "add", "l1")),
      Seq(Op("a", 5, 2, "r0", "add", "l2")), // higher logical wins
      Seq(Op("a", 5, 2, "r2", "add", "r2wins"))) // same (p,l), higher replica
    assert(got(1).map(_.payload) == Seq("l2"))
    assert(got(2).map(_.payload) == Seq("r2wins"))
  }

  test("one change per key per batch: the post-batch converged register") {
    val got = runBatches(
      Seq(Op("a", 1, 0, "r1", "add", "v1"), Op("a", 9, 0, "r1", "add", "v9"),
        Op("a", 4, 0, "r1", "add", "v4"), Op("b", 2, 0, "r1", "add", "w2")))
    assert(got(0).sortBy(_.id).map(c => (c.id, c.payload)) ==
      Seq(("a", "v9"), ("b", "w2")))
  }

  test("batch-mode parity with Crdt.converge on an add/delete op-log") {
    val rnd = new scala.util.Random(5)
    val log = (0 until 400).map { i =>
      val id = s"k${rnd.nextInt(40)}"
      val op = if (rnd.nextInt(4) == 0) "delete" else "add"
      Op(id, rnd.nextInt(20).toLong, rnd.nextInt(3).toLong,
        s"r${rnd.nextInt(3)}", op, s"p$i")
    }
    // distinct ranks per id: drop rank-duplicates so both engines see a
    // unique winner (Crdt.converge's max-struct and the register's strict
    // takeover agree on ties only when ties don't exist)
    val uniq = log.groupBy(o => (o.id, o.physical, o.logical, o.replica))
      .map(_._2.head).toSeq
    val viaState = StatefulLww.changes(uniq.toDS())
      .collect().map(c => c.id -> ((c.alive, c.payload))).toMap
    val opLog = uniq.toDF()
      .selectExpr("id", "physical", "logical", "replica", "op", "payload")
    val viaConverge = graft.ops.Crdt.converge(opLog)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // converge returns only ALIVE ids; the register stream marks them
    val aliveViaState = viaState.collect {
      case (id, (true, p)) => id -> p
    }
    assert(aliveViaState.keySet == viaConverge.keySet,
      s"alive sets differ: ${aliveViaState.keySet} vs ${viaConverge.keySet}")
    aliveViaState.foreach { case (id, p) =>
      assert(viaConverge(id) == p, s"$id: $p vs ${viaConverge(id)}")
    }
  }
}
