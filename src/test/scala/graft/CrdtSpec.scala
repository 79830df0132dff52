package graft

import org.apache.spark.sql.functions._

import graft.ops.Crdt

/** CRDT convergence + anti-entropy (reference: experimental/crdt.rs). */
class CrdtSpec extends SparkSpec {
  import spark.implicits._

  // (id, op, physical, logical, replica, payload)
  private def log(rows: (String, String, Long, Long, Long, Double)*) =
    rows.toDF("id", "op", "physical", "logical", "replica", "payload")

  test("converge: LWW by (physical, logical, replica) with logical/replica tiebreaks") {
    val state = Crdt.converge(log(
      ("a", "add", 10, 0, 1, 1.0),
      ("a", "update", 10, 0, 2, 2.0),  // same physical/logical, replica 2 > 1
      ("a", "update", 10, 1, 0, 3.0),  // logical 1 beats both
      ("b", "add", 5, 0, 0, 7.0)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(state == Map("a" -> 3.0, "b" -> 7.0))
  }

  test("converge: delete tombstones unless a newer add resurrects; pre-add updates vanish") {
    val state = Crdt.converge(log(
      // dead: delete out-ranks the add
      ("dead", "add", 1, 0, 0, 1.0), ("dead", "delete", 2, 0, 0, 0.0),
      // revived: add AFTER the delete resurrects with the add's payload;
      // the pre-add update (ts 3) must not leak into the revived entry
      ("revived", "add", 1, 0, 0, 1.0), ("revived", "delete", 2, 0, 0, 0.0),
      ("revived", "update", 3, 0, 0, 99.0), ("revived", "add", 4, 0, 0, 5.0),
      // orphan: update without any add never materializes
      ("orphan", "update", 9, 0, 0, 1.0)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(state == Map("revived" -> 5.0))
  }

  test("converge merges metadata: add map overlaid by newer per-key LWW, null removes") {
    val ops = Seq(
      ("x", "add", 1L, 0L, 0L, 1.0, Map("k1" -> "a", "k2" -> "b"), null, null),
      ("x", "update_metadata", 2L, 0L, 0L, 0.0, null, "k1", "a2"),
      ("x", "update_metadata", 3L, 0L, 0L, 0.0, null, "k2", null),
      ("x", "update_metadata", 4L, 0L, 0L, 0.0, null, "k3", "c"))
      .toDF("id", "op", "physical", "logical", "replica", "payload", "meta",
        "meta_key", "meta_value")
    val m = Crdt.converge(ops, metaCols = true)
      .select("metadata").as[Map[String, String]].collect().head
    assert(m == Map("k1" -> "a2", "k3" -> "c"), "k2 removed by the null write")
  }

  test("deltaSince filters by HLC >= since inclusively") {
    val l = log(("a", "add", 5, 0, 0, 1.0), ("a", "update", 5, 1, 0, 2.0),
      ("a", "update", 6, 0, 0, 3.0))
    assert(Crdt.deltaSince(l, None).count() == 3)
    assert(Crdt.deltaSince(l, Some((5L, 1L, 0L))).count() == 2)
    assert(Crdt.deltaSince(l, Some((7L, 0L, 0L))).count() == 0)
  }

  test("conflicts: concurrent update/delete = same physical, different replica") {
    val local = Crdt.converge(log(("a", "add", 10, 0, 1, 1.0)))
    val delta = log(
      ("a", "update", 10, 0, 2, 2.0),  // same physical 10, replica 2 ≠ 1
      ("a", "update", 11, 0, 2, 2.0),  // later physical → no conflict
      ("a", "add", 10, 0, 3, 2.0))     // adds never conflict (crdt.rs:516)
    val c = Crdt.conflicts(local, delta).collect()
    assert(c.length == 1 && c.head.getLong(2) == 10 && c.head.getLong(4) == 2)
  }

  test("bucket hashes reproduce the reference fold and diff pinpoints changes") {
    val a = (0 until 40).map(i => (i.toString, i * 1000L)).toDF("id", "h")
    val b = (0 until 40).map(i =>
      (i.toString, if (i == 25) 9999L else i * 1000L)).toDF("id", "h")
    // hand-computed single-bucket fold over sorted ids "0","1","10"
    def refIdHash(s: String) =
      s.getBytes("UTF-8").foldLeft(0L)((h, c) => h * 31 + (c & 0xff))
    val tiny = Seq(("1", 5L), ("0", 3L), ("10", 7L)).toDF("id", "h")
    val got = Crdt.bucketHashes(tiny, col("id"), col("h"), bucketCount = 1)
      .collect()
    val expect = Seq("0", "1", "10").foldLeft(0L) { (h, id) =>
      h * 17 + refIdHash(id) + Map("0" -> 3L, "1" -> 5L, "10" -> 7L)(id)
    }
    // bucketCount 1 normalizes to 2 buckets; id-sorted fold per bucket
    assert(got.map(_.getAs[Long]("count")).sum == 3)
    val whole = Crdt.bucketHashes(tiny, col("id"), col("h"), 2).collect()
      .sortBy(_.getAs[Int]("bucket"))
    // fold("0") then fold over {"1","10"}: verify the per-bucket formula
    assert(whole.head.getAs[Long]("bucket_hash") == refIdHash("0") + 3L)

    val d = Crdt.merkleDiff(a, b, col("id"), col("h"), bucketCount = 8)
      .collect()
    assert(d.length == 1, "exactly one bucket differs")
    val bkt = d.head.getAs[Int]("bucket")
    val member = Crdt.bucketed(a, col("id"), col("h"), 8)
      .filter(col("id") === "25").select("bucket").as[Int].collect().head
    assert(bkt == member, "the differing bucket is the perturbed id's bucket")
    assert(Crdt.merkleDiff(a, a, col("id"), col("h"), 8).count() == 0)
    assert(expect == Seq("0", "1", "10").foldLeft(0L) { (h, id) =>
      h * 17 + refIdHash(id) + Map("0" -> 3L, "1" -> 5L, "10" -> 7L)(id) })
  }
}
