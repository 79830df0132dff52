package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Graph-augmented vector search (reference: src/services/ai/graph_query.rs
  * :94-180): the query vector ranks seed nodes, a bounded traversal over
  * typed directed edges pulls in graph-adjacent nodes, and the fused
  * score orders the final top-k —
  * `score = vector_distance * vectorWeight + hops * graphWeight * 0.1`
  * (seeds at hops = 0 reduce to the pure weighted distance, exactly the
  * reference's seed insertion at graph_query.rs:135-142).
  *
  * Spark-first shape: seeds are one TakeOrderedAndProject over the scored
  * node scan; each hop is an equi-join frontier expansion (edges on src)
  * with a left-anti join against already-assigned nodes, so the whole
  * traversal is maxHops bounded join stages — no cartesian, no driver
  * recursion, and each node enters the result at most once.
  *
  * Two deterministic re-expressions of reference behavior that is
  * iteration-order dependent (documented per the project's adjudication
  * discipline):
  *  - the reference traversal is a DFS whose first-visit-wins depth
  *    depends on seed iteration and edge insertion order
  *    (graph_query.rs:158-180); here a non-seed node's `hops` is its
  *    MINIMUM edge distance from the seed set (level-synchronous BFS),
  *    with ties between equal-hop arrivals resolved to the smallest
  *    (path, edge_types) pair — order-free and shuffle-stable;
  *  - seed ranking tie-breaks on id (the reference's sort is unstable
  *    on equal distances).
  *
  * Edges whose `dst` has no node row are dropped by the inner join with
  * the scored nodes — the reference skips them the same way
  * (`nodes.get(&edge.target)` miss, graph_query.rs:166).
  */
object GraphQuery {

  /** Hop interval at which [[assignments]] truncates plan lineage with a
    * lazy localCheckpoint (see the in-loop comment). 4 keeps the default
    * maxHops=2 traversal checkpoint-free (zero behavior change for the
    * reference's shallow usage) while bounding deep traversals.
    */
  private val CheckpointEvery = 4

  /** Top-k of [[assignments]] by fused score (graph_query.rs:146-149).
    *
    * Note a consequence of the reference's own formula: a traversed
    * (non-seed) node has BOTH a worse distance than every seed (seeds
    * are the 2k closest) and a positive hop penalty, so its score never
    * beats a seed's — the k ≤ 2k cut returns seeds whenever ≥ 2k nodes
    * exist, and the hop/path metadata only surfaces through
    * [[assignments]]. The reference behaves identically (its tests only
    * ever observe graphs small enough that every node is a seed).
    *
    * @param nodes (id: string, vector: array&lt;float&gt;)
    * @param edges (src: string, dst: string, edge_type: string)
    * @return (id, vector_distance, hops, path array&lt;string&gt;,
    *         edge_types array&lt;string&gt;, score), k rows, score asc
    */
  def search(nodes: DataFrame, edges: DataFrame, queryVec: Array[Float],
             k: Int = 10, maxHops: Int = 2, vectorWeight: Double = 0.6,
             graphWeight: Double = 0.4, metric: String = "cosine",
             distanceColumn: Column => Column = identity): DataFrame =
    assignments(nodes, edges, queryVec, k, maxHops, vectorWeight,
      graphWeight, metric, distanceColumn)
      .orderBy(col("score").asc, col("id").asc)
      .limit(k)

  /** The full seed + traversal assignment frame (the reference's internal
    * `results` map, graph_query.rs:134-145): one row per reached node
    * with its hop count, witness path, and fused score. Unbounded by k
    * on the traversal side — callers cut it (as [[search]] does) or
    * consume the whole reachable set.
    */
  def assignments(nodes: DataFrame, edges: DataFrame, queryVec: Array[Float],
                  k: Int = 10, maxHops: Int = 2, vectorWeight: Double = 0.6,
                  graphWeight: Double = 0.4, metric: String = "cosine",
                  distanceColumn: Column => Column = identity): DataFrame = {
    require(k > 0 && maxHops >= 0, s"k=$k, maxHops=$maxHops")
    val q = lit(queryVec.map(_.toDouble))
    def dist(vecCol: Column): Column =
      distanceColumn(Distances.distance(metric, vecCol, q))
    // ONE full distance scan, for seed ranking only (graph_query.rs:
    // 129-133); the traversal below never recomputes corpus distances —
    // hop existence checks are column-pruned id semi-joins, and
    // vector_distance attaches at the END for just the assigned rows
    // (|seeds| + frontier-bounded, not N-per-hop)
    val seeds = nodes
      .select(col("id"), dist(col("vector")).as("__d"))
      .orderBy(col("__d").asc, col("id").asc).limit(2 * k).drop("__d")
      .select(col("id"), lit(0).as("hops"), array(col("id")).as("path"),
        array().cast("array<string>").as("edge_types"))

    // renamed once so every hop's join resolves purely by (unique) name —
    // the iterative self-join would otherwise trip ambiguous-attribute
    // detection when hop h+1 rejoins the edges hop h's frontier came from
    val e = edges.select(col("src").as("__esrc"), col("dst").as("__edst"),
      col("edge_type").as("__eet"))
    val nodeIds = nodes.select(col("id").as("__nid"))

    var assigned = seeds
    var frontier = seeds.select("id", "path", "edge_types")
    for (hop <- 1 to maxHops) {
      val expanded = frontier
        .join(e, col("id") === col("__esrc"))
        .select(col("__edst").as("id"),
          concat(col("path"), array(col("__edst"))).as("path"),
          concat(col("edge_types"), array(col("__eet")))
            .as("edge_types"))
      val fresh = expanded.join(
        assigned.select(col("id").as("__aid")),
        col("id") === col("__aid"), "left_anti")
      // min-(path, edge_types) per node: the BFS tie-break above
      val chosen = fresh.groupBy("id")
        .agg(min(struct(col("path"), col("edge_types"))).as("c"))
        .select(col("id"), col("c.path").as("path"),
          col("c.edge_types").as("edge_types"))
      // dangling dsts (no node row) drop BEFORE they can expand — the
      // reference's nodes.get(target) miss (graph_query.rs:166) — via an
      // id-only semi-join (no vector read, no distance math)
      val existing = chosen
        .join(nodeIds, col("id") === col("__nid"), "left_semi")
        .select(col("id"), lit(hop).as("hops"), col("path"),
          col("edge_types"))
      assigned = assigned.unionByName(existing)
      frontier = existing.select("id", "path", "edge_types")
      // Lineage bound: each hop's anti-join embeds the whole accumulated
      // `assigned` plan, so without truncation total plan size is
      // O(maxHops²) and analysis cost climbs for deep traversals. Every
      // CheckpointEvery hops the accumulated frame is LAZILY
      // localCheckpointed (blocks materialize at the caller's first
      // action; plan-carried — ContextCleaner reclaims them when the
      // result frame becomes unreachable) and the frontier re-derives
      // from the flat checkpointed plan, keeping plan growth linear in
      // maxHops. Skipped at the final hop (nothing further joins it).
      // Cluster caveat: localCheckpoint blocks are NOT recomputable —
      // once lineage is truncated, losing an executor (crash or dynamic
      // allocation reclaim) fails the deep traversal's action with a
      // lost-block error instead of recomputing. On a deployment with a
      // checkpoint dir and dynamic allocation, prefer reliable
      // `checkpoint()` here; local-mode (single JVM) cannot lose blocks.
      if (hop % CheckpointEvery == 0 && hop < maxHops) {
        assigned = assigned.localCheckpoint(false)
        frontier = assigned.filter(col("hops") === hop)
          .select("id", "path", "edge_types")
      }
    }

    assigned
      .join(nodes.select(col("id"), col("vector")), "id")
      .withColumn("vector_distance", dist(col("vector")))
      .drop("vector")
      .withColumn("score",
        col("vector_distance") * vectorWeight +
          col("hops") * (graphWeight * 0.1))
      .select(col("id"), col("vector_distance"), col("hops"), col("path"),
        col("edge_types"), col("score"))
  }
}
