package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.ops.Pitr._
import graft.ops.Pitr.RecoveryTarget._

/** Model-based property test for the PITR durability layer (the
  * TransactionsModelSpec pattern): ~60 seeded random operations —
  * snapshot (labels from a small pool so Named resolution sees
  * duplicates), mutate, recoverTo named/latest/timestamp, clock ticks
  * of 0 ms (id collisions) through 8 days (age-cutoff retention), and
  * mid-sequence "new service over the same backupDir" restarts —
  * replayed against a plain in-memory model with the reference
  * resolution/retention semantics (pitr_service.rs: Named is first
  * label-or-id match, Latest is last, Timestamp is last at-or-before;
  * retention is max-count FIFO then age cutoff). After every step the
  * service's restore-point catalog must equal the model's, and after
  * every recovery the registry contents must equal the model's
  * snapshot state exactly.
  */
class PitrModelSpec extends SparkSpec {
  import spark.implicits._

  // collection state: id -> (vector, metadata)
  private type CollState = Map[String, (Seq[Float], String)]
  private final case class MSnap(id: String, label: String, ts: Long,
                                 state: Map[String, CollState])

  private val colls = Seq("a", "b")

  private def toDf(s: CollState) = {
    val rows = s.toSeq.sortBy(_._1)
      .map { case (id, (v, m)) => (id, v.toArray, m) }
    rows.toDF("id", "vector", "metadata")
  }

  private def collect(df: org.apache.spark.sql.DataFrame): CollState =
    df.select("id", "vector", "metadata").collect()
      .map(r => r.getString(0) -> (r.getSeq[Float](1), r.getString(2)))
      .toMap

  test("60 random snapshot/mutate/recover/prune/restart steps match the " +
      "in-memory model exactly") {
    val rnd = new scala.util.Random(20260812)
    val dir = java.nio.file.Files.createTempDirectory("graft-pitr-model")
      .toString
    var clock = 1000L
    val maxSnaps = 4
    val config = PitrConfig(dir, retentionDays = 7, maxSnapshots = maxSnaps)

    // live registry and its model twin
    val registry = mutable.LinkedHashMap[String,
      org.apache.spark.sql.DataFrame]()
    val model = mutable.Map.empty[String, CollState]
    colls.foreach { c =>
      val seed = (0 until 3)
        .map(i => s"$c$i" -> (Seq(i.toFloat, 1f), s"m$i")).toMap
      model(c) = seed
      registry(c) = toDf(seed)
    }

    def newService() = new PitrService(spark, config,
      () => registry.keys.toSeq, registry(_), registry.update,
      () => clock)
    var svc = newService()

    val msnaps = mutable.Buffer.empty[MSnap]
    val usedIds = mutable.Set.empty[String] // = backup dirs on disk

    def modelSnapshot(label: String): Unit = {
      val base = s"snap-$clock"
      val id = Iterator.from(0)
        .map(k => if (k == 0) base else s"$base-$k")
        .find(c => !usedIds.contains(c)).get
      usedIds += id
      msnaps += MSnap(id, label, clock, model.toMap)
      // retention: max-count FIFO, then age cutoff
      while (msnaps.size > maxSnaps) { msnaps.remove(0); () }
      val cutoff = math.max(0L, clock - 7L * 24 * 3600 * 1000)
      val aged = msnaps.filter(_.ts < cutoff)
      aged.foreach(s => msnaps -= s)
    }

    def modelResolve(t: RecoveryTarget): Option[MSnap] = t match {
      case Named(l)      => msnaps.find(s => s.label == l || s.id == l)
      case Latest        => msnaps.lastOption
      case Timestamp(ms) => msnaps.filter(_.ts <= ms).lastOption
    }

    def checkCatalog(): Unit = {
      val listed = svc.listRestorePoints
      assert(listed.map(p => (p.id, p.label, p.timestampMs)) ==
        msnaps.toSeq.map(s => (s.id, s.label, s.ts)),
        s"catalog mismatch at clock $clock")
      assert(svc.stats.totalSnapshots == msnaps.size)
    }

    def checkRegistry(): Unit = colls.foreach { c =>
      assert(collect(registry(c)) == model(c),
        s"registry '$c' diverged from model at clock $clock")
    }

    def recover(t: RecoveryTarget): Unit = modelResolve(t) match {
      case None =>
        intercept[PitrError](svc.recoverTo(t)); ()
      case Some(ms) =>
        val r = svc.recoverTo(t)
        assert(r.restorePointId == ms.id)
        assert(r.vectorsRestored == ms.state.values.map(_.size).sum)
        colls.foreach(c => model(c) = ms.state(c))
        checkRegistry()
    }

    var snapshots = 0
    var recoveries = 0
    var restarts = 0
    (1 to 60).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // mutate a random collection (both twins)
          val c = colls(rnd.nextInt(colls.size))
          val cur = model(c)
          val mutated = rnd.nextInt(3) match {
            case 0 => // upsert
              cur + (s"$c${rnd.nextInt(6)}" ->
                (Seq(rnd.nextInt(50).toFloat, rnd.nextInt(50).toFloat),
                  s"m${rnd.nextInt(9)}"))
            case 1 if cur.nonEmpty => // delete an existing id
              cur - cur.keys.toSeq.sorted.apply(rnd.nextInt(cur.size))
            case _ => // overwrite everything with a fresh row
              Map(s"$c-fresh${rnd.nextInt(4)}" ->
                (Seq(9f, rnd.nextInt(9).toFloat), "fresh"))
          }
          model(c) = mutated
          registry(c) = toDf(mutated)
        case 3 | 4 | 5 => // snapshot under a (possibly repeated) label
          val label = s"L${rnd.nextInt(5)}"
          snapshots += 1
          modelSnapshot(label)
          svc.createSnapshot(label)
          ()
        case 6 => // recover by label (pool repeats) or id or garbage
          recoveries += 1
          val l = rnd.nextInt(3) match {
            case 0 => s"L${rnd.nextInt(5)}"
            case 1 if msnaps.nonEmpty =>
              msnaps(rnd.nextInt(msnaps.size)).id
            case _ => "no-such-label"
          }
          recover(Named(l))
        case 7 =>
          recoveries += 1
          recover(if (rnd.nextBoolean()) Latest
                  else Timestamp(clock - rnd.nextInt(3000)))
        case 8 => // advance the clock (0 forces same-ms id collisions)
          clock += Seq(0L, 0L, 10L, 500L, 5000L,
            8L * 24 * 3600 * 1000)(rnd.nextInt(6))
        case 9 => // driver restart: fresh service over the same dir
          restarts += 1
          svc = newService()
      }
      checkCatalog()
    }
    // the sequence must actually have exercised the interesting paths
    assert(snapshots >= 10 && recoveries >= 5 && restarts >= 2)
    assert(usedIds.size == snapshots)
    // closing sweep: restart once more and recover to every live point
    svc = newService()
    checkCatalog()
    msnaps.toSeq.foreach { s => recover(Named(s.id)) }
  }

  test("12 same-millisecond snapshots reload in creation order (numeric " +
      "collision suffixes, not lexicographic ids) and pruned same-ms ids " +
      "are never reused") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pitr-suffix")
      .toString
    val registry = mutable.LinkedHashMap(
      "a" -> Seq(("x", Array(1f, 0f), "mx")).toDF("id", "vector", "metadata"))
    def svcWith(max: Int) = new PitrService(spark,
      PitrConfig(dir, maxSnapshots = max),
      () => registry.keys.toSeq, registry(_), registry.update, () => 777L)

    val svc = svcWith(100)
    val ids = (1 to 12).map(i => svc.createSnapshot(s"s$i").id)
    assert(ids == "snap-777" +: (1 to 11).map(k => s"snap-777-$k"))
    // reload: creation order, so "snap-777-10" sorts after "snap-777-2"
    val svc2 = svcWith(100)
    assert(svc2.listRestorePoints.map(_.id) == ids)
    assert(svc2.recoverTo(Latest).restorePointId == "snap-777-11")
    // FIFO-prune the oldest same-ms snapshots (retention runs on the
    // next createSnapshot), then snapshot again: the pruned ids' data
    // dirs survive on disk, so their ids are NOT reused — the suffix
    // keeps growing and reload order stays correct
    val svc3 = svcWith(3)
    assert(svc3.listRestorePoints.size == 12)
    val p = svc3.createSnapshot("s13")
    assert(p.id == "snap-777-12")
    assert(svc3.listRestorePoints.map(_.id) ==
      Seq("snap-777-10", "snap-777-11", "snap-777-12"))
    val svc4 = svcWith(3)
    assert(svc4.listRestorePoints.map(_.id) ==
      Seq("snap-777-10", "snap-777-11", "snap-777-12"))
    // the in-memory buffer no longer contains "snap-777" (FIFO-pruned),
    // so only the on-disk directory check stops its reuse here
    assert(svc4.createSnapshot("s14").id == "snap-777-13")
  }
}
