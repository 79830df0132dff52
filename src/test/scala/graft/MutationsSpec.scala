package graft

import org.apache.spark.sql.functions._

import graft.ops.Mutations
import graft.ops.Mutations.DedupPolicy

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private def coll = Seq(
    ("a", Array(1f, 0f), """{"x": 1}""", 100L, null.asInstanceOf[java.lang.Long], false),
    ("b", Array(0f, 1f), """{"x": 2}""", 200L, java.lang.Long.valueOf(150L), false),
    ("c", Array(1f, 1f), """{"x": 3}""", 300L, null.asInstanceOf[java.lang.Long], true),
  ).toDF("id", "vector", "metadata", "inserted_at", "ttl_expires_at", "deleted")

  test("upsert replaces matching ids and appends new ones") {
    val updates = Seq(
      ("a", Array(9f, 9f), """{"x": 10}""", 400L, null.asInstanceOf[java.lang.Long], false),
      ("d", Array(2f, 2f), """{"x": 4}""", 400L, null.asInstanceOf[java.lang.Long], false),
    ).toDF("id", "vector", "metadata", "inserted_at", "ttl_expires_at", "deleted")
    val got = Mutations.upsert(coll, updates)
    assert(got.count() == 4)
    assert(got.filter(col("id") === "a").select("inserted_at").as[Long].head() == 400L)
  }

  test("merge patch: null removes, insert adds, non-object replaces (shallow)") {
    assert(Mutations.mergePatchJson("""{"a":1,"b":2}""", """{"b":null,"c":3}""")
      == """{"a":1,"c":3}""")
    assert(Mutations.mergePatchJson("""{"a":1}""", """"scalar"""") == "\"scalar\"")
    assert(Mutations.mergePatchJson(null, """{"a":1}""") == """{"a":1}""")
    // shallow: nested object replaced wholesale, not merged (metadata.rs:551)
    assert(Mutations.mergePatchJson("""{"o":{"x":1,"y":2}}""", """{"o":{"x":9}}""")
      == """{"o":{"x":9}}""")
  }

  test("tombstone + compact + needsCompaction") {
    val t = Mutations.tombstone(coll, col("id") === "a")
    assert(t.filter(col("deleted")).count() == 2) // a + pre-deleted c
    assert(Mutations.needsCompaction(t, 0.5) === true)
    assert(Mutations.needsCompaction(t, 0.7) === false)
    // compact at now=160: drops deleted (a, c) and expired b (ttl 150 <= 160)
    assert(Mutations.compact(t, 160L).count() == 0)
    // compact at now=100: b survives (ttl 150 > 100)
    assert(Mutations.compact(t, 100L).select("id").as[String].collect().toSeq == Seq("b"))
  }

  test("ttl stats") {
    val got = Mutations.ttlStats(coll, 160L).as[(Long, Long, Long)].head()
    assert(got == ((3L, 1L, 1L)))
  }

  test("dedup-on-insert: reject / merge / version policies") {
    val base = coll.filter(!col("deleted"))
    val incoming = Seq(
      ("dup1", Array(1f, 0f), """{"y": 7}""", 500L, null.asInstanceOf[java.lang.Long], false), // dup of a
      ("new1", Array(-1f, 0.5f), """{"y": 8}""", 500L, null.asInstanceOf[java.lang.Long], false),
    ).toDF("id", "vector", "metadata", "inserted_at", "ttl_expires_at", "deleted")

    val rej = Mutations.dedupInsert(base, incoming, 0.01, DedupPolicy.Reject)
    assert(rej.collection.count() == 3) // a, b + new1
    val out = rej.outcomes.orderBy("id")
      .select("id", "outcome", "existing_id").as[(String, String, String)].collect().toSeq
    assert(out == Seq(("dup1", "rejected", "a"), ("new1", "inserted", null)))

    val mrg = Mutations.dedupInsert(base, incoming, 0.01, DedupPolicy.MergeMetadata)
    val aMeta = mrg.collection.filter(col("id") === "a")
      .select("metadata").as[String].head()
    assert(aMeta.contains("\"y\":7") && aMeta.contains("\"x\":1"))

    val ver = Mutations.dedupInsert(base, incoming, 0.01, DedupPolicy.Version)
    val ids = ver.collection.select("id").as[String].collect().toSet
    assert(ids.contains("new1") && ids.exists(_.startsWith("dup1-v")))
  }

  test("dedup MergeMetadata: several near-dups of ONE existing id fold, no fan-out") {
    val base = coll.filter(!col("deleted"))
    val incoming = Seq(
      ("p1", Array(1f, 0f), """{"y": 7, "z": 1}""", 500L, null.asInstanceOf[java.lang.Long], false),
      ("p2", Array(1f, 0.001f), """{"y": 9}""", 500L, null.asInstanceOf[java.lang.Long], false),
    ).toDF("id", "vector", "metadata", "inserted_at", "ttl_expires_at", "deleted")
    val got = Mutations.dedupInsert(base, incoming, 0.01, DedupPolicy.MergeMetadata)
    // the target row must NOT be duplicated by the two patches
    assert(got.collection.filter(col("id") === "a").count() == 1)
    assert(got.collection.count() == 2) // a (patched twice), b
    val aMeta = got.collection.filter(col("id") === "a")
      .select("metadata").as[String].head()
    // sequential fold in incoming-id order: p1 then p2 → y=9 wins, z stays
    assert(aMeta.contains("\"y\":9") && aMeta.contains("\"z\":1")
      && aMeta.contains("\"x\":1"))
  }

  test("dedup blocked path matches the exact path on an exhaustive probe") {
    val base = coll.filter(!col("deleted"))
    val incoming = Seq(
      ("dup1", Array(1f, 0f), """{"y": 7}""", 500L, null.asInstanceOf[java.lang.Long], false),
      ("new1", Array(-1f, 0.5f), """{"y": 8}""", 500L, null.asInstanceOf[java.lang.Long], false),
    ).toDF("id", "vector", "metadata", "inserted_at", "ttl_expires_at", "deleted")
    // maxExactRows = 0 forces IVF blocking; nprobe == numCells makes the
    // probe exhaustive, so the outcomes must be bit-identical to exact
    val exact = Mutations.dedupInsert(base, incoming, 0.01, DedupPolicy.Reject)
    val blocked = Mutations.dedupInsert(base, incoming, 0.01, DedupPolicy.Reject,
      maxExactRows = 0, numCells = 2, nprobe = 2)
    val e = exact.outcomes.orderBy("id")
      .select("id", "outcome", "existing_id").as[(String, String, String)]
      .collect().toSeq
    val b = blocked.outcomes.orderBy("id")
      .select("id", "outcome", "existing_id").as[(String, String, String)]
      .collect().toSeq
    assert(b == e)
    assert(blocked.collection.count() == exact.collection.count())
  }

  test("dedup blocked path: 100k-row collection, no cartesian, planted dup caught") {
    val n = 100000L
    // last component pinned to 1 → two rows are cosine-identical iff the
    // whole pattern matches (no accidental parallel pairs)
    val vec = array((col("id") % 7 + 1).cast("float"),
      (col("id") % 11 + 1).cast("float"), (col("id") % 13 + 1).cast("float"),
      lit(1f))
    val big = spark.range(n).select(col("id"), vec.as("vector"),
      lit("{}").as("metadata"))
    val incoming = Seq(
      (1000005L, Seq(6f, 6f, 6f, 1f), "{}"),   // == row id 5's pattern
      (1000006L, Seq(100f, 1f, 1f, 1f), "{}")) // far from every pattern
      .toDF("id", "vector", "metadata")
      .select(col("id"), col("vector").cast("array<float>").as("vector"),
        col("metadata"))
    val got = Mutations.dedupInsert(big, incoming, 0.0001, DedupPolicy.Reject,
      numCells = 16, nprobe = 4)
    val plan = got.outcomes.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val out = got.outcomes.orderBy("id")
      .select("id", "outcome", "existing_id")
      .as[(Long, String, java.lang.Long)].collect().toSeq
    assert(out.head == ((1000005L, "rejected", java.lang.Long.valueOf(5L))))
    assert(out(1)._2 == "inserted")
  }

  test("dedup Version: suffix continues across calls (no -v1 collision)") {
    val base = coll.filter(!col("deleted"))
    val in1 = Seq(("dup1", Array(1f, 0f), """{}""", 500L,
      null.asInstanceOf[java.lang.Long], false))
      .toDF("id", "vector", "metadata", "inserted_at", "ttl_expires_at", "deleted")
    val c1 = Mutations.dedupInsert(base, in1, 0.01, DedupPolicy.Version).collection
    val in2 = Seq(("dup1", Array(1f, 0.0001f), """{}""", 600L,
      null.asInstanceOf[java.lang.Long], false))
      .toDF("id", "vector", "metadata", "inserted_at", "ttl_expires_at", "deleted")
    val c2 = Mutations.dedupInsert(c1, in2, 0.01, DedupPolicy.Version).collection
    val versions = c2.filter(col("id").startsWith("dup1-v"))
      .select("id").as[String].collect().toSeq.sorted
    assert(versions == Seq("dup1-v1", "dup1-v2"))
    // all ids unique
    assert(c2.count() == c2.select("id").distinct().count())
  }
}
