package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Pitr._
import graft.ops.Pitr.RecoveryTarget._

/** PITR service vs pitr_service.rs: snapshot manifests (id format, size
  * estimate, sha256 checksum), recovery-target resolution, retention,
  * auto-snapshot scheduling — and the parquet durability improvement
  * (snapshots survive a fresh service instance).
  */
class PitrSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pitr").toString
    val registry = mutable.LinkedHashMap[String, DataFrame](
      "a" -> Seq(("x", Array(1f, 0f), "mx"), ("y", Array(0f, 1f), "my"))
        .toDF("id", "vector", "metadata"),
      "b" -> Seq(("z", Array(1f, 1f), "mz"))
        .toDF("id", "vector", "metadata"))
    var clock = 1000L
    val svc = new PitrService(spark,
      PitrConfig(dir, retentionDays = 7, maxSnapshots = 3,
        autoSnapshotIntervalMs = 500L),
      () => registry.keys.toSeq, registry(_), registry.update,
      () => clock)
    (svc, registry, (d: Long) => clock += d, dir)
  }

  test("snapshot manifest: id format, reference size estimate, sha256 " +
      "checksum; verify round-trips") {
    val (svc, _, _, _) = fixture()
    val p = svc.createSnapshot("first")
    assert(p.id == "snap-1000" && p.label == "first")
    assert(p.collections == Seq("a", "b"))
    assert(p.totalVectors == 3)
    // count·dim·4 + count·256 per collection: 2·2·4+2·256 + 1·2·4+1·256
    assert(p.sizeBytes == (2 * 2 * 4 + 2 * 256) + (2 * 4 + 256))
    assert(p.checksum.contains(
      checksumOf("snap-1000", 3, p.sizeBytes)))
    assert(svc.verifySnapshot("snap-1000"))
    intercept[PitrError](svc.verifySnapshot("snap-9"))
    assert(!svc.shouldAutoSnapshot) // just snapped
  }

  test("recovery resolves Named (label or id), Latest, and Timestamp " +
      "targets and restores the parquet state") {
    val (svc, registry, tick, _) = fixture()
    svc.createSnapshot("v1")
    tick(1000)
    // mutate: drop y, add w
    registry("a") = registry("a").filter(col("id") =!= "y")
      .unionByName(Seq(("w", Array(9f, 9f), "mw"))
        .toDF("id", "vector", "metadata"))
    svc.createSnapshot("v2")
    tick(1000)
    // recover to v1 by label: y is back, w is gone
    val r1 = svc.recoverTo(Named("v1"))
    assert(r1.restorePointId == "snap-1000" && r1.verified)
    assert(r1.collectionsRestored == Seq("a", "b"))
    assert(r1.vectorsRestored == 3)
    assert(registry("a").select("id").as[String].collect().toSet ==
      Set("x", "y"))
    // Latest → v2 (w present, y absent)
    svc.recoverTo(Latest)
    assert(registry("a").select("id").as[String].collect().toSet ==
      Set("x", "w"))
    // Timestamp: last snapshot at or before t → v1 at 1500, v2 at 2100
    assert(svc.recoverTo(Timestamp(1500L)).restorePointId == "snap-1000")
    assert(svc.recoverTo(Timestamp(2100L)).restorePointId == "snap-2000")
    // by id too
    assert(svc.recoverTo(Named("snap-2000")).restorePointId == "snap-2000")
    intercept[PitrError](svc.recoverTo(Timestamp(1L)))
  }

  test("retention: max-count FIFO then age cutoff; stats track the window") {
    val (svc, _, tick, _) = fixture()
    (1 to 5).foreach { i => svc.createSnapshot(s"s$i"); tick(10) }
    // maxSnapshots = 3 → only the last three survive
    assert(svc.listRestorePoints.map(_.label) == Seq("s3", "s4", "s5"))
    val st = svc.stats
    assert(st.totalSnapshots == 3)
    assert(st.oldestSnapshotMs.contains(1020L))
    assert(st.newestSnapshotMs.contains(1040L))
    // age cutoff: jump 8 days → everything expires on the next snapshot
    tick(8L * 24 * 3600 * 1000)
    svc.createSnapshot("fresh")
    assert(svc.listRestorePoints.map(_.label) == Seq("fresh"))
    // auto-snapshot interval
    assert(!svc.shouldAutoSnapshot)
    tick(600)
    assert(svc.shouldAutoSnapshot)
  }

  test("snapshots are durable: a FRESH service over the same backup dir " +
      "reloads the manifest catalog and can recoverTo a snapshot taken " +
      "by a previous instance") {
    val (svc, registry, _, dir) = fixture()
    val p = svc.createSnapshot("keep")
    // the parquet payload is real and readable out-of-band
    val back = spark.read.parquet(s"$dir/${p.id}/a.parquet")
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("id", "vector", "metadata"))
    // simulate a driver restart: brand-new service, same backupDir
    registry("a") = registry("a").filter(lit(false))
    val svc2 = new PitrService(spark, PitrConfig(dir),
      () => registry.keys.toSeq, registry(_), registry.update,
      () => 9999L)
    val listed = svc2.listRestorePoints
    assert(listed.map(_.id) == Seq(p.id))
    assert(listed.head.label == "keep" &&
      listed.head.checksum == p.checksum &&
      listed.head.sizeBytes == p.sizeBytes &&
      listed.head.collections == p.collections)
    val r = svc2.recoverTo(Named("keep"))
    assert(r.restorePointId == p.id && r.verified)
    assert(registry("a").count() == 2)
  }

  test("same-millisecond snapshots get distinct ids instead of " +
      "overwriting; retention-pruned manifests do not resurrect on " +
      "reload") {
    val (svc, registry, tick, dir) = fixture()
    val p1 = svc.createSnapshot("one") // clock frozen at 1000
    val p2 = svc.createSnapshot("two")
    assert(p1.id == "snap-1000" && p2.id == "snap-1000-1")
    assert(svc.recoverTo(Named("one")).restorePointId == "snap-1000")
    assert(svc.recoverTo(Named("two")).restorePointId == "snap-1000-1")
    // fill past maxSnapshots=3 → "one" is FIFO-pruned, manifest deleted
    tick(10); svc.createSnapshot("three")
    tick(10); svc.createSnapshot("four")
    assert(svc.listRestorePoints.map(_.label) == Seq("two", "three", "four"))
    val svc2 = new PitrService(spark, PitrConfig(dir),
      () => registry.keys.toSeq, registry(_), registry.update,
      () => 9999L)
    assert(svc2.listRestorePoints.map(_.label) == Seq("two", "three", "four"))
  }
}
