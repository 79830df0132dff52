package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.GraphQuery

/** Mirrors the reference's tests (graph_query.rs:186-244) on the
  * re-expressed BFS semantics, plus the corners the adjudication note
  * pins: min-hop wins, smallest-(path, edge_types) tie-break, seeds
  * override traversal arrivals, dangling edges drop.
  */
class GraphQuerySpec extends SparkSpec {
  import spark.implicits._

  private def nodes(rows: (String, Seq[Float])*): DataFrame =
    rows.toDF("id", "vector")

  private def edges(rows: (String, String, String)*): DataFrame =
    rows.toDF("src", "dst", "edge_type")

  test("vector search ranks the closest node first (graph_query.rs:190)") {
    val r = GraphQuery.search(
      nodes("a" -> Seq(1f, 0f, 0f, 0f), "b" -> Seq(0f, 1f, 0f, 0f)),
      edges(), Array(1f, 0f, 0f, 0f), k = 2).collect()
    assert(r.head.getString(0) == "a")
    assert(r.head.getAs[Int]("hops") == 0)
  }

  test("graph traversal reaches neighbors of seeds (graph_query.rs:199)") {
    val r = GraphQuery.search(
      nodes("a" -> Seq(0.9f, 0.1f, 0f, 0f), "b" -> Seq(0.1f, 0.9f, 0f, 0f)),
      edges(("a", "b", "related")),
      Array(0.9f, 0.1f, 0f, 0f), k = 5, maxHops = 2).collect()
    val byId = r.map(x => x.getString(0) -> x).toMap
    assert(byId.contains("a") && byId.contains("b"))
  }

  test("hop counts, paths and edge types accumulate along the chain") {
    // k = 1 → 2 seeds (a, b); c is outside the seed set and only
    // reachable over b's edge, so its assignment carries hop metadata
    val r = GraphQuery.assignments(
      nodes("a" -> Seq(1f, 0f, 0f), "b" -> Seq(0.7f, 0.7f, 0f),
        "c" -> Seq(0f, 0f, 1f)),
      edges(("a", "b", "r1"), ("b", "c", "r2")),
      Array(1f, 0f, 0f), k = 1, maxHops = 3).collect()
    val c = r.find(_.getString(0) == "c").get
    assert(c.getAs[Int]("hops") == 1)
    assert(c.getAs[scala.collection.Seq[String]]("path") == Seq("b", "c"))
    assert(c.getAs[scala.collection.Seq[String]]("edge_types") == Seq("r2"))
    assert(r.find(_.getString(0) == "b").get.getAs[Int]("hops") == 0)
    // and the traversed score = dist·vw + hops·gw·0.1
    assert(math.abs(c.getAs[Double]("score") -
      (c.getAs[Double]("vector_distance") * 0.6 + 0.4 * 0.1)) < 1e-12)
  }

  test("a node that is both seed and edge target stays a seed (hops 0)") {
    val r = GraphQuery.search(
      nodes("a" -> Seq(1f, 0f), "b" -> Seq(0.9f, 0.1f)),
      edges(("a", "b", "r")),
      Array(1f, 0f), k = 2, maxHops = 2).collect()
    assert(r.find(_.getString(0) == "b").get.getAs[Int]("hops") == 0)
  }

  test("dangling edges (dst without a node row) drop, as in the reference") {
    val r = GraphQuery.search(
      nodes("a" -> Seq(1f, 0f)),
      edges(("a", "ghost", "r")),
      Array(1f, 0f), k = 5, maxHops = 2).collect()
    assert(r.map(_.getString(0)).toSet == Set("a"))
  }

  test("equal-hop arrivals resolve to the smallest (path, edge_types)") {
    // k = 1 → seeds are s1, s2; far arrives at hop 1 from both
    val r = GraphQuery.assignments(
      nodes("s1" -> Seq(1f, 0f, 0f), "s2" -> Seq(0.9f, 0.1f, 0f),
        "far" -> Seq(0f, 0f, 1f)),
      edges(("s2", "far", "b_type"), ("s1", "far", "z_type"),
        ("s1", "far", "a_type")),
      Array(1f, 0f, 0f), k = 1, maxHops = 1).collect()
    val far = r.find(_.getString(0) == "far").get
    // path ["s1","far"] < ["s2","far"]; among s1's parallel edges,
    // edge_types ["a_type"] < ["z_type"]
    assert(far.getAs[scala.collection.Seq[String]]("path") == Seq("s1", "far"))
    assert(far.getAs[scala.collection.Seq[String]]("edge_types") == Seq("a_type"))
  }

  test("score fuses weighted distance and hop penalty; k truncates") {
    val r = GraphQuery.search(
      nodes("a" -> Seq(1f, 0f), "b" -> Seq(0.6f, 0.8f), "c" -> Seq(0f, 1f)),
      edges(("a", "c", "r")),
      Array(1f, 0f), k = 2, maxHops = 1).collect()
    assert(r.length == 2)
    val a = r.find(_.getString(0) == "a").get
    assert(math.abs(a.getAs[Double]("score") -
      a.getAs[Double]("vector_distance") * 0.6) < 1e-12)
    val sorted = r.map(_.getAs[Double]("score"))
    assert(sorted.sameElements(sorted.sorted))
  }

  test("deep traversal crosses the lineage checkpoint boundary with " +
      "correct hop counts (maxHops=6 > CheckpointEvery=4)") {
    // chain a→b→c→d→e→f→g; query sits on a so seeds = {a, b} (k=1 → 2k)
    val chain = Seq("a", "b", "c", "d", "e", "f", "g")
    val vecs = nodes(
      "a" -> Seq(1f, 0f, 0f), "b" -> Seq(0.9f, 0.1f, 0f),
      "c" -> Seq(0f, 0f, 1f), "d" -> Seq(0f, 0.1f, 1f),
      "e" -> Seq(0f, 0.2f, 1f), "f" -> Seq(0f, 0.3f, 1f),
      "g" -> Seq(0f, 0.4f, 1f))
    val es = edges(chain.sliding(2).map(p => (p(0), p(1), "next")).toSeq: _*)
    val r = GraphQuery.assignments(vecs, es, Array(1f, 0f, 0f),
      k = 1, maxHops = 6).collect()
    val hops = r.map(x => x.getString(0) -> x.getAs[Int]("hops")).toMap
    // b is a seed (hop 0); c..g arrive at BFS distance from b
    assert(hops == Map("a" -> 0, "b" -> 0, "c" -> 1, "d" -> 2, "e" -> 3,
      "f" -> 4, "g" -> 5), hops.toString)
    val g = r.find(_.getString(0) == "g").get
    assert(g.getAs[scala.collection.Seq[String]]("path") ==
      Seq("b", "c", "d", "e", "f", "g"))
  }

  test("the plan stays cartesian-free across hops") {
    val n = spark.range(100).select(col("id").cast("string").as("id"),
      array(col("id").cast("float"), lit(1f)).as("vector"))
    val e = spark.range(99).select(col("id").cast("string").as("src"),
      (col("id") + 1).cast("string").as("dst"), lit("next").as("edge_type"))
    val plan = GraphQuery.search(n, e, Array(50f, 1f), k = 5, maxHops = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
