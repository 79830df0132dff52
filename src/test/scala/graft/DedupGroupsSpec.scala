package graft

import org.apache.spark.sql.functions._

import graft.pipeline.DedupGroups

class DedupGroupsSpec extends SparkSpec {
  import spark.implicits._

  // chain 1-2-3 (transitive), clique 10-11, singleton pair 20-21
  private lazy val pairs = Seq(
    (1L, 2L, 0.98), (2L, 3L, 0.97), (10L, 11L, 1.0), (20L, 21L, 1.0))
    .toDF("id_a", "id_b", "sim")

  test("components: transitive chains merge into one group") {
    val comp = DedupGroups.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp(20L) == 20L && comp(21L) == 20L)
  }

  test("groups: members sorted, pair-average similarity") {
    val g = DedupGroups.groups(pairs, col("sim")).collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getLong(2), r.getDouble(3))).toMap
    assert(g(1L)._1 == Seq(1L, 2L, 3L) && g(1L)._2 == 3)
    // pairs observed from the id_a side of group 1: (1,2)=0.98, (2,3)=0.97
    assert(math.abs(g(1L)._3 - 0.975) < 1e-9)
    assert(g(10L)._1 == Seq(10L, 11L) && g(10L)._3 == 1.0)
  }

  test("report: duplicate counts split exact vs near") {
    val r = DedupGroups.report(pairs, col("sim"), totalVectors = 100).head()
    assert(r.getLong(0) == 100)       // total_vectors
    assert(r.getLong(1) == 3)         // num_groups
    assert(r.getLong(2) == 4)         // num_duplicates (2+1+1)
    assert(r.getLong(3) == 2)         // exact (groups 10, 20)
    assert(r.getLong(4) == 2)         // near (group 1's two non-canonical)
  }

  test("idsToRemove honors strategy") {
    def removed(s: DedupGroups.Strategy): Set[Long] =
      DedupGroups.idsToRemove(pairs, s).as[Long].collect().toSet
    assert(removed(DedupGroups.Strategy.KeepFirst) ==
      Set(2L, 3L, 11L, 21L))
    assert(removed(DedupGroups.Strategy.KeepLatest) ==
      Set(1L, 2L, 10L, 20L))
    // richest: 2 outranks 1 and 3; 11 outranks 10; 20/21 unranked -> min kept
    val rich = Seq((2L, 5.0), (11L, 9.0)).toDF("id", "richness")
    assert(removed(DedupGroups.Strategy.KeepRichest(rich)) ==
      Set(1L, 3L, 10L, 21L))
  }

  test("components at 5k pairs: star topology converges in few supersteps") {
    // one hub connected to 5000 spokes plus a disjoint 1000-chain segment;
    // threshold 0 forces the distributed superstep path
    val star = (1L to 5000L).map(i => (0L, i)).toDF("id_a", "id_b")
    val comp = DedupGroups.components(star, smallGraphThreshold = 0L)
    assert(comp.filter(col("canonical") === 0L).count() == 5001L)
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val c2 = DedupGroups.components(chain, smallGraphThreshold = 0L)
    assert(c2.filter(col("canonical") === 0L).count() == 201L)
  }

  test("small-graph union-find path equals the distributed supersteps") {
    // mixed topology: chain + star + singleton pair + transitive bridge
    val edges = ((0L until 50L).map(i => (i, i + 1)) ++
      (100L to 140L).map(i => (99L, i)) ++
      Seq((200L, 201L), (50L, 99L))).toDF("id_a", "id_b")
    val fast = DedupGroups.components(edges)
      .collect().map(r => (r.get(0), r.get(1))).toSet
    val dist = DedupGroups.components(edges, smallGraphThreshold = 0L)
      .collect().map(r => (r.get(0), r.get(1))).toSet
    assert(fast == dist)
    // the bridge (50,99) merges chain and star into one 0-rooted component
    assert(fast.count(_._2 == 0L) == 93)
  }

  test("string ids: fast path matches Spark's UTF-8 byte ordering") {
    // U+E000 (EE 80 80 in UTF-8, 0xE000 in UTF-16) vs U+1F600 (F0 9F 98 80
    // in UTF-8, surrogate pair starting 0xD83D in UTF-16): Java compareTo
    // says the emoji sorts FIRST, Spark's unsigned UTF-8 bytes say U+E000
    // does — the canonical must not depend on smallGraphThreshold
    val edges = Seq(("x", "😀x")).toDF("id_a", "id_b")
    val fast = DedupGroups.components(edges)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val dist = DedupGroups.components(edges, smallGraphThreshold = 0L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast == dist)
    assert(fast.forall(_._2 == "x"), s"canonical must be U+E000x: $fast")
  }

  test("unsupported id types are rejected on the fast path") {
    val edges = Seq(((1.23f, 0), (4.56f, 0))).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      DedupGroups.components(edges).collect()
    }
    assert(e.getMessage.contains("unsupported id type"))
  }
}
