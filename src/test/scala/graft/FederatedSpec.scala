package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Federated
import graft.ops.Federated.{Dedup, Strategy}

class FederatedSpec extends SparkSpec {
  import spark.implicits._

  // three overlapping "instances": id 2 appears everywhere with different
  // distances; id 1 only in a; id 9 only in c
  private def srcA: DataFrame =
    Seq((1L, 0.10), (2L, 0.30), (3L, 0.50)).toDF("id", "distance")
  private def srcB: DataFrame =
    Seq((2L, 0.20), (4L, 0.40), (3L, 0.45)).toDF("id", "distance")
  private def srcC: DataFrame =
    Seq((9L, 0.05), (2L, 0.25)).toDF("id", "distance")
  private def sources = Seq("a" -> srcA, "b" -> srcB, "c" -> srcC)

  test("distance merge: global ascending, dedup keeps smallest distance") {
    val m = Federated.merge(sources, k = 10, Strategy.DistanceBased)
      .select("id", "distance").as[(Long, Double)].collect()
    assert(m.head == ((9L, 0.05)))
    assert(m.toMap.apply(2L) == 0.20) // best of 0.30/0.20/0.25
    assert(m.map(_._1).distinct.length == m.length)
  }

  test("rrf merge: sums 1/(60+rank) across sources (merger.rs:88-114)") {
    val m = Federated.merge(sources, k = 10, Strategy.ReciprocalRankFusion)
      .select("id", "rrf_score").as[(Long, Double)].collect().toMap
    // id 2: rank 2 in a, rank 1 in b, rank 2 in c
    val expected = 1.0 / 62 + 1.0 / 61 + 1.0 / 62
    assert(math.abs(m(2L) - expected) < 1e-12)
    // singleton id 1: rank 1 in a only
    assert(math.abs(m(1L) - 1.0 / 61) < 1e-12)
  }

  test("first-response merge: first non-empty source wins (merger.rs:115)") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "distance")
    val m = Federated.merge(Seq("x" -> empty, "b" -> srcB, "c" -> srcC),
        k = 2, Strategy.FirstResponse)
      .select("id").as[Long].collect().toSet
    assert(m == Set(2L, 4L)) // srcB's best two, srcC never consulted
  }

  test("duplicate source names stay positionally independent: the " +
      "reference merger never reads the name (merger.rs:67-75)") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "distance")
    // two sources BOTH named "n": first-response must return only the
    // first non-empty one's rows (srcB), never the union of same-named
    // legs — an indexWhere-by-name pool would merge them
    val m = Federated.merge(
        Seq("x" -> empty, "n" -> srcB, "n" -> srcC),
        k = 10, Strategy.FirstResponse)
      .select("id").as[Long].collect().toSet
    assert(m == Set(2L, 3L, 4L)) // all of srcB, none of srcC's id 9
    // and RRF across same-named legs still sums both contributions
    val rrf = Federated.merge(Seq("n" -> srcB, "n" -> srcC), k = 10,
        Strategy.ReciprocalRankFusion)
      .select("id", "rrf_score").as[(Long, Double)].collect().toMap
    assert(math.abs(rrf(2L) - (1.0 / 61 + 1.0 / 62)) < 1e-12)
  }

  test("priority weights divide distance before the merge; weight 1 = plain") {
    val weighted = Federated.merge(sources, k = 1, Strategy.PriorityWeighted,
        weights = Map("a" -> 10.0))
      .select("id").as[Long].collect()
    assert(weighted.head == 1L) // 0.10/10 beats c's 0.05
    val unweighted = Federated.merge(sources, k = 1, Strategy.PriorityWeighted)
      .select("id").as[Long].collect()
    assert(unweighted.head == 9L) // all weights 1 == DistanceBased
  }

  test("consensus merge: count desc then avg distance (merger.rs:130-165)") {
    val m = Federated.merge(sources, k = 10, Strategy.Consensus)
      .select("id", "consensus_count", "distance")
      .as[(Long, Long, Double)].collect()
    assert(m.head._1 == 2L && m.head._2 == 3L)
    assert(math.abs(m.head._3 - 0.25) < 1e-12) // avg(0.30, 0.20, 0.25)
    val counts = m.map(_._2)
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("dedup strategies: first-seen honors source order; average averages") {
    val pooled = Seq(
      (2L, 0.30, 0), (2L, 0.20, 1), (2L, 0.25, 2), (1L, 0.10, 0))
      .toDF("id", "distance", "__source_idx")
      .withColumn("__source_rank", lit(1))
    val first = Federated.dedup(pooled, Dedup.FirstSeen)
      .select("id", "distance").as[(Long, Double)].collect().toMap
    assert(first(2L) == 0.30) // source 0's value, not the best
    val avg = Federated.dedup(pooled, Dedup.AverageDistance)
      .select("id", "distance").as[(Long, Double)].collect().toMap
    assert(math.abs(avg(2L) - 0.25) < 1e-12)
  }

  test("stats reports per-source rows + responded flags") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "distance")
    val st = Federated.stats(Seq("a" -> srcA, "x" -> empty))
      .select("source", "rows", "responded")
      .as[(String, Long, Boolean)].collect().toMap2
    assert(st("a") == ((3L, true)) && st("x") == ((0L, false)))
  }

  private implicit class Tup3Ops[A, B, C](xs: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = xs.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
