package graft

import org.apache.spark.sql.functions._

import graft.ops.SemanticGraph

class SemanticGraphSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters + a bridge node
  private def vecs = Seq(
    ("a1", Array(1f, 0f)), ("a2", Array(0.99f, 0.05f)), ("a3", Array(0.98f, -0.05f)),
    ("b1", Array(0f, 1f)), ("b2", Array(0.05f, 0.99f)),
    ("bridge", Array(0.7f, 0.7f))).toDF("id", "vector")

  private def edges = SemanticGraph.build(vecs, col("id"), col("vector"), k = 2)

  test("k-NN edge build: k per node, similarity = 1 - min(dist, 1), threshold filters") {
    val e = edges.collect()
    assert(e.length == 12) // 6 nodes × k=2
    val a1 = edges.filter(col("src") === "a1").select("dst").as[String].collect().toSet
    assert(a1 == Set("a2", "a3")) // same-cluster neighbors
    // high threshold keeps only intra-cluster edges
    val strict = SemanticGraph.build(vecs, col("id"), col("vector"), 2,
      threshold = Some(0.99))
    assert(strict.filter(col("src") === "bridge").count() == 0)
  }

  test("degrees and stats") {
    val d = SemanticGraph.degrees(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d.values.forall(_ == 2))
    val s = SemanticGraph.stats(edges).collect()(0)
    assert(s.getLong(0) == 6 && s.getLong(1) == 12)
    assert(math.abs(s.getDouble(2) - 2.0) < 1e-9)
  }

  test("n-hop neighborhood reports minimum hop per node") {
    val n = SemanticGraph.neighborhood(edges, "a1", maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(n("a1") == 0)
    assert(n("a2") == 1 && n("a3") == 1)
    // a2/a3's neighbors at hop 2 only if not already seen
    assert(n.values.forall(_ <= 2))
  }

  test("BFS path exists through the bridge; unreachable returns None") {
    // k=3 connects the clusters via the bridge node
    val e3 = SemanticGraph.build(vecs, col("id"), col("vector"), k = 3)
    val p = SemanticGraph.findPath(e3, "a1", "b1", maxHops = 6)
    assert(p.isDefined)
    assert(p.get.head == "a1" && p.get.last == "b1")
    // strict threshold disconnects: no path
    val strict = SemanticGraph.build(vecs, col("id"), col("vector"), 2,
      threshold = Some(0.99))
    assert(SemanticGraph.findPath(strict, "a1", "b1", maxHops = 6).isEmpty)
  }

  test("findPath finds a destination first reached at exactly maxHops") {
    // line graph a→b→c: c is 2 hops away, so maxHops = 2 must find it
    // (regression: the loop exited after the last expansion without
    // checking the newly expanded level)
    val line = Seq(("a", "b", 1.0), ("b", "c", 1.0)).toDF("src", "dst", "similarity")
    assert(SemanticGraph.findPath(line, "a", "c", maxHops = 2)
      .contains(Seq("a", "b", "c")))
    assert(SemanticGraph.findPath(line, "a", "c", maxHops = 1).isEmpty)
  }

  test("exact build guard fires past maxExactRows") {
    val data = (0 until 30).map(i => (s"v$i", Array(i.toFloat, 1f)))
      .toDF("id", "vector")
    val e = intercept[IllegalArgumentException] {
      SemanticGraph.build(data, col("id"), col("vector"), k = 2,
        maxExactRows = 10)
    }
    assert(e.getMessage.contains("buildBlocked"))
  }

  test("blocked build: no cartesian in the plan, high recall vs exact") {
    // 300 vectors in 3 gaussian clusters (deterministic)
    val rnd = new scala.util.Random(7)
    val centers = Seq(Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f))
    val data = (0 until 300).map { i =>
      val c = centers(i % 3)
      (s"v$i", c.map(x => x + rnd.nextGaussian().toFloat * 0.15f))
    }.toDF("id", "vector")
    val blocked = SemanticGraph.buildBlocked(data, col("id"), col("vector"),
      k = 5, numCells = 9, nprobe = 3)
    // scale guarantee: candidate generation is an equi-join on cell — the
    // physical plan must not contain a cartesian or nested-loop join
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // recall vs the exact all-pairs build (AnnSpec-style bound)
    val exact = SemanticGraph.build(data, col("id"), col("vector"), k = 5)
    val eSet = exact.select("src", "dst").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val bSet = blocked.select("src", "dst").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val recall = eSet.intersect(bSet).size.toDouble / eSet.size
    assert(recall >= 0.9, s"edge recall $recall < 0.9")
  }

  test("blocked build at full probe equals the exact build") {
    val blocked = SemanticGraph.buildBlocked(vecs, col("id"), col("vector"),
      k = 2, numCells = 4, nprobe = 4)
    val exact = SemanticGraph.build(vecs, col("id"), col("vector"), k = 2)
    val b = blocked.orderBy("src", "dst").collect().map(r =>
      (r.getString(0), r.getString(1), math.round(r.getDouble(2) * 1e6)))
    val e = exact.orderBy("src", "dst").collect().map(r =>
      (r.getString(0), r.getString(1), math.round(r.getDouble(2) * 1e6)))
    assert(b.toSeq == e.toSeq)
  }

  test("label propagation separates the two clusters (bridge joins one)") {
    val strict = SemanticGraph.build(vecs, col("id"), col("vector"), 2,
      threshold = Some(0.95))
    val got = SemanticGraph.communities(strict, maxIterations = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a1") == got("a2") && got("a2") == got("a3"))
    assert(got("b1") == got("b2"))
    assert(got("a1") != got("b1"))
  }
}
