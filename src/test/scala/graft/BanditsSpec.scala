package graft

import org.apache.spark.sql.functions._

import graft.ops.Bandits

class BanditsSpec extends SparkSpec {
  import spark.implicits._

  test("fitParams: alpha = 1 + Σreward, beta = 1 + Σ(1-reward)") {
    val fb = Seq(("a", 1.0), ("a", 0.5), ("b", 0.0))
      .toDF("id", "relevance")
    val p = Bandits.fitParams(fb).as[(String, Double, Double)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(p("a") == ((2.5, 1.5)) && p("b") == ((1.0, 2.0)))
  }

  test("updateParams merge == fitParams over the concatenated log") {
    val log1 = Seq(("a", 1.0), ("b", 0.2)).toDF("id", "relevance")
    val log2 = Seq(("a", 0.4), ("c", 0.9)).toDF("id", "relevance")
    val merged = Bandits.updateParams(Bandits.fitParams(log1), log2)
      .orderBy("id").as[(String, Double, Double)].collect().toSeq
    val direct = Bandits.fitParams(log1.unionByName(log2))
      .orderBy("id").as[(String, Double, Double)].collect().toSeq
    assert(merged.zip(direct).forall { case ((i1, a1, b1), (i2, a2, b2)) =>
      i1 == i2 && math.abs(a1 - a2) < 1e-12 && math.abs(b1 - b2) < 1e-12 })
  }

  test("decay pulls posteriors toward Beta(1,1) (reranker.rs:672-676)") {
    val p = Seq(("a", 10.0, 2.0)).toDF("id", "alpha", "beta")
    val d = Bandits.decay(p, 0.5).as[(String, Double, Double)].collect().head
    assert(d == (("a", 5.5, 1.5)))
    // repeated decay converges to the uniform prior (EV -> 0.5)
    var cur = p
    (1 to 40).foreach(_ => cur = Bandits.decay(cur, 0.8))
    val ev = cur.select(Bandits.expectedValue(col("alpha"), col("beta")))
      .as[Double].collect().head
    assert(math.abs(ev - 0.5) < 0.01)
  }

  test("noise is deterministic, in [-1, 1), and id-dependent") {
    val ids = spark.range(0, 1000).toDF("id")
    val n = ids.select(Bandits.noise(col("id"), seed = 7).as("n"))
      .as[Double].collect()
    assert(n.forall(x => x >= -1.0 && x < 1.0))
    assert(n.distinct.length > 100) // varies across ids
    val again = ids.select(Bandits.noise(col("id"), seed = 7).as("n"))
      .as[Double].collect()
    assert(n.sameElements(again))
  }

  test("rerank: heavy positive feedback floats a result; no-history = prior") {
    val results = Seq((1L, 0.1), (2L, 0.2), (3L, 0.3)).toDF("id", "distance")
    // id 3: 50 successes; id 1: 50 failures; id 2: never seen
    val fb = ((1 to 50).map(_ => (3L, 1.0)) ++ (1 to 50).map(_ => (1L, 0.0)))
      .toDF("id", "relevance")
    val ranked = Bandits.rerank(results, Bandits.fitParams(fb), seed = 7)
      .select("id", "thompson_score").as[(Long, Double)].collect()
    assert(ranked.head._1 == 3L)   // mean ~0.98, tiny variance
    assert(ranked.last._1 == 1L)   // mean ~0.02
    val byId = ranked.toMap
    assert(byId(2L) > 0.3 && byId(2L) < 0.7) // prior mean 0.5 ± noise·stddev
    assert(ranked.forall { case (_, s) => s >= 0.0 && s <= 1.0 })
  }

  test("ab bucket is deterministic and splits queries") {
    val ids = spark.range(0, 100).toDF("qid")
    val buckets = ids.select(Bandits.abBucket(col("qid"), seed = 3).as("b"))
      .as[Boolean].collect()
    assert(buckets.count(identity) > 20 && buckets.count(!_) > 20)
    val again = ids.select(Bandits.abBucket(col("qid"), seed = 3).as("b"))
      .as[Boolean].collect()
    assert(buckets.sameElements(again))
  }

  test("stats: tracked ids and posterior mass") {
    val fb = Seq(("a", 1.0), ("a", 0.5), ("b", 0.0)).toDF("id", "relevance")
    val st = Bandits.stats(Bandits.fitParams(fb))
      .as[(Long, Double, Double)].collect().head
    assert(st._1 == 2L)
    assert(math.abs(st._2 - 1.5) < 1e-12) // Σreward
    assert(math.abs(st._3 - 3.0) < 1e-12) // Σfeedback events
  }
}
