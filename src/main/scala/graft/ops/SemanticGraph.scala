package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Semantic k-NN graph over a vector collection (SURVEY.md §2.3 "graph
  * search"; reference: src/experimental/graph.rs — build :116-270,
  * neighborhood :310-353, paths :355-500, label-propagation communities
  * :504-588, stats :589-660).
  *
  * The graph IS a DataFrame: `edges(src, dst, similarity)` — directed, each
  * node pointing at its k nearest neighbors with `similarity = 1 −
  * min(dist, 1)` and an optional threshold, exactly the reference's edge
  * rule. Build is a k-NN self-join (per-node window top-k); at 100 TB the
  * same shape runs IVF-blocked (join within cells) like embeddingNearDup.
  * Traversals are iterative frontier joins — hop count is the driver-side
  * loop bound, every step an equi-join on node id. Community detection is
  * synchronous label propagation with deterministic tie-breaks (the
  * reference iterates a HashMap, which is order-nondeterministic; we pick
  * max weight then min label so results are stable under partitioning).
  */
object SemanticGraph {

  /** Build the k-NN edge list (graph.rs:116-270). */
  def build(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
            threshold: Option[Double] = None,
            metric: String = "cosine"): DataFrame = {
    val a = df.select(idCol.as("src"), vecCol.as("__va"))
    val b = df.select(idCol.as("dst"), vecCol.as("__vb"))
    val pairs = a.join(b, col("src") =!= col("dst"))
      .withColumn("__dist", Distances.distance(metric, col("__va"), col("__vb")))
      .withColumn("similarity", lit(1.0) - least(col("__dist"), lit(1.0)))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("__dist").asc, col("dst").asc)
    val topk = pairs
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
    threshold.fold(topk)(t => topk.filter(col("similarity") >= t))
      .select(col("src"), col("dst"), col("similarity"))
  }

  /** Out-degrees (graph.rs degree/stats). */
  def degrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  def topNodesByDegree(edges: DataFrame, k: Int): DataFrame =
    degrees(edges).orderBy(col("degree").desc, col("id").asc).limit(k)

  /** (num_nodes, num_edges, avg_degree, avg_similarity) — graph.rs:589. */
  def stats(edges: DataFrame): DataFrame = {
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst"))).distinct().count()
    edges.agg(
      lit(nodes).as("num_nodes"),
      count(lit(1)).as("num_edges"),
      (count(lit(1)).cast("double") / nodes).as("avg_degree"),
      avg(col("similarity")).as("avg_similarity"))
  }

  /** n-hop neighborhood via iterative frontier joins (graph.rs:310-353):
    * returns (id, hop) with the MINIMUM hop at which each node is reached
    * (hop 0 = the seed).
    */
  def neighborhood(edges: DataFrame, seedId: Any, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var visited = Seq((seedId.toString, 0)).toDF("id", "hop")
    var frontier = visited
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = edges.join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").cast("string").as("id"))
        .distinct()
        .join(visited.select(col("id")), Seq("id"), "left_anti")
        .withColumn("hop", lit(hop))
        .localCheckpoint(true) // cut the iterative lineage
      frontier = next
      visited = visited.unionByName(next).localCheckpoint(true)
    }
    visited
  }

  /** Unweighted shortest path src→dst by BFS (graph.rs:355-390). Returns
    * the node sequence, or None when unreachable within maxHops.
    */
  def findPath(edges: DataFrame, from: Any, to: Any,
               maxHops: Int = 10): Option[Seq[String]] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val target = to.toString
    var paths = Seq((from.toString, Seq(from.toString))).toDF("id", "path")
    var seen = Set(from.toString)
    var hop = 0
    while (hop < maxHops) {
      val hit = paths.filter(col("id") === target)
        .select("path").as[Seq[String]].collect().headOption
      if (hit.isDefined) return hit
      hop += 1
      val nextRows = edges.join(paths.select(col("id").as("src"), col("path")), "src")
        .filter(!array_contains(col("path"), col("dst")))
        .select(col("dst").cast("string").as("id"),
          concat(col("path"), array(col("dst").cast("string"))).as("path"))
        // one (deterministic) path per node: shortest, then lexicographic
        .withColumn("__r", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("path"))))
        .filter(col("__r") === 1).drop("__r")
        .collect()
      val fresh = nextRows.filter(r => !seen.contains(r.getString(0)))
      if (fresh.isEmpty) return None
      seen ++= fresh.map(_.getString(0))
      paths = fresh.map(r => (r.getString(0), r.getSeq[String](1))).toSeq
        .toDF("id", "path")
    }
    // nodes first reached at exactly maxHops hops still count
    paths.filter(col("id") === target)
      .select("path").as[Seq[String]].collect().headOption
  }

  /** Similarity-weighted label propagation (graph.rs:504-588), synchronous
    * supersteps: every node adopts the label with the highest incident
    * similarity mass (ties → smallest label). Stops on fixpoint or
    * maxIterations. Returns (id, community).
    */
  def communities(edges: DataFrame, maxIterations: Int = 100): DataFrame = {
    // Vote over the UNDIRECTED view: a k-NN graph is asymmetric (a→b does
    // not imply b→a), and synchronous label propagation on directed edges
    // oscillates instead of converging; symmetrized mass is the standard
    // distributed-LPA stabilizer (the reference avoids this only because
    // its sequential loop applies updates asynchronously).
    val undirected = edges.select(col("src"), col("dst"), col("similarity"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"),
        col("similarity")))
      .localCheckpoint(true) // also cuts any expensive upstream build plan
    val nodes = undirected.select(col("src").as("id")).distinct()
    var labels = nodes.withColumn("community",
      dense_rank().over(Window.orderBy(col("id"))).cast("long"))
      .localCheckpoint(true)
    // Self-vote damping: each node also votes for its CURRENT label with
    // half its incident mass — kills the 2-cycles synchronous propagation
    // falls into on tight symmetric clusters (a neighbor majority is still
    // always able to flip the node).
    val selfMass = undirected.groupBy(col("src"))
      .agg((sum(col("similarity")) / 2).as("__selfw"))
      .localCheckpoint(true)
    var iter = 0
    var quiet = 0 // consecutive no-change supersteps (masked updates can
                  // legitimately produce one quiet step; three in a row
                  // with different colorings ≈ fixpoint)
    while (iter < maxIterations && quiet < 3) {
      iter += 1
      val neighborVotes = undirected
        .join(labels.select(col("id").as("dst"), col("community")), "dst")
        .select(col("src"), col("community"), col("similarity").as("__v"))
      val selfVotes = selfMass
        .join(labels.select(col("id").as("src"), col("community")), "src")
        .select(col("src"), col("community"), col("__selfw").as("__v"))
      val next = neighborVotes.unionByName(selfVotes)
        .groupBy(col("src"), col("community"))
        .agg(sum(col("__v")).as("__w"))
        .withColumn("__r", row_number().over(
          Window.partitionBy(col("src"))
            .orderBy(col("__w").desc, col("community").asc)))
        .filter(col("__r") === 1)
        // semi-synchronous update: a per-iteration hash coloring picks the
        // half of the nodes allowed to move this superstep — the
        // distributed stand-in for the reference's asynchronous sequential
        // loop. Because the coloring changes every iteration, a pairwise
        // swap cycle cannot persist: some superstep lets exactly one side
        // move.
        .filter(pmod(xxhash64(col("src"), lit(iter)), lit(2)) === 0)
        .select(col("src").as("id"), col("community"))
      val merged = labels.select(col("id"))
        .join(next, Seq("id"), "left")
        // isolated nodes keep their previous label
        .join(labels.withColumnRenamed("community", "__prev"), Seq("id"))
        .select(col("id"),
          coalesce(col("community"), col("__prev")).as("community"))
        .localCheckpoint(true)
      val changed = merged
        .join(labels.withColumnRenamed("community", "__prev"), Seq("id"))
        .filter(col("community") =!= col("__prev")).limit(1).count() > 0
      quiet = if (changed) 0 else quiet + 1
      labels = merged
    }
    labels
  }
}
