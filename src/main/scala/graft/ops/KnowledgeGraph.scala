package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Typed knowledge graph with hybrid vector+graph search (reference:
  * src/experimental/knowledge_graph.rs).
  *
  * Spark re-expression: entities are a DataFrame (id, entity_type, name,
  * embedding [, properties…]); relations are a DataFrame (source, target,
  * relation_type, weight). The reference's HashMap adjacency indexes
  * become grouped aggregations over the relations table; BFS reachability
  * is the iterative-frontier-join pattern shared with
  * [[SemanticGraph.neighborhood]] (bounded hops, localCheckpoint-cut
  * lineage).
  *
  * Scoring (knowledge_graph.rs:337-441): combined_score =
  * 0.7·cosine_similarity + 0.3·graph_score, where graph_score is degree
  * centrality min((in+out)/|entities|, 1) — or 1.0 for entities reachable
  * from context anchors within `maxContextHops`.
  *
  * Scale: degree centrality is one groupBy over relations keyed by entity;
  * search is scan + shuffle-free top-k; reachability shuffles frontier-
  * sized frames per hop (hops are small constants).
  */
object KnowledgeGraph {

  /** Defaults (knowledge_graph.rs:123-147). */
  case class Config(similarityWeight: Double = 0.7,
                    graphWeight: Double = 0.3,
                    maxContextHops: Int = 2,
                    bidirectionalSearch: Boolean = true)

  /** Degree centrality per entity: min((out+in) / |entities|, 1)
    * (knowledge_graph.rs:577-585). Entities without relations score 0.
    * Output: (id, graph_score).
    */
  def degreeCentrality(entities: DataFrame, relations: DataFrame,
                       idCol: String = "id"): DataFrame = {
    val n = math.max(entities.count(), 1L)
    val deg = relations.select(col("source").as("id"))
      .unionAll(relations.select(col("target").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("__deg"))
    entities.select(col(idCol).as("id"))
      .join(deg, Seq("id"), "left")
      .select(col("id"),
        least(coalesce(col("__deg"), lit(0L)).cast("double") / n.toDouble,
          lit(1.0)).as("graph_score"))
  }

  /** Hybrid search (knowledge_graph.rs:337-385): optional entity-type
    * filter, combined_score = simWeight·cosine + graphWeight·centrality,
    * descending top-k. Centrality is computed over the FULL graph even
    * when the candidate set is type-filtered (the reference's type_index
    * narrows candidates, not the degree normalizer).
    */
  def search(entities: DataFrame, relations: DataFrame, query: Array[Float],
             k: Int, entityType: Option[String] = None,
             config: Config = Config(), idCol: String = "id"): DataFrame = {
    val cent = degreeCentrality(entities, relations, idCol)
      .withColumnRenamed("id", "__cid")
    val cand = entityType.fold(entities)(t =>
      entities.filter(col("entity_type") === t))
    cand.join(cent, col(idCol) === col("__cid"), "left")
      .withColumn("graph_score", coalesce(col("graph_score"), lit(0.0)))
      .withColumn("similarity",
        lit(1.0) - Distances.distance("cosine", col("embedding"), lit(query)))
      .withColumn("combined_score",
        col("similarity") * config.similarityWeight +
          col("graph_score") * config.graphWeight)
      .drop("__cid")
      .orderBy(col("combined_score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Entities reachable from `anchors` within `maxHops` undirected hops,
    * anchors included at hop 0 (knowledge_graph.rs:440-466). Output:
    * (id, hop) with the minimum hop per entity.
    */
  def reachable(relations: DataFrame, anchors: Seq[Any],
                maxHops: Int): DataFrame = {
    val spark = relations.sparkSession
    import spark.implicits._
    // ids are string-normalized so the frontier joins are type-stable for
    // any caller id type (the same convention as SemanticGraph's BFS)
    val undirected = relations
      .select(col("source").cast("string").as("src"),
        col("target").cast("string").as("dst"))
      .unionAll(relations.select(col("target").cast("string").as("src"),
        col("source").cast("string").as("dst")))
    var visited = anchors.map(a => (a.toString, 0)).toDF("id", "hop")
    var frontier = visited
    var hop = 0
    // lineage-cut only on DEEP walks: for the usual 2-hop context search
    // the plan stays small and two eager materializations per hop cost
    // more than they save
    val cut = maxHops > 3
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      var next = undirected.join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("hop", lit(hop))
      if (cut) next = next.localCheckpoint(true)
      frontier = next
      visited = visited.unionByName(next)
      if (cut) visited = visited.localCheckpoint(true)
    }
    visited
  }

  /** Context search (knowledge_graph.rs:388-438): like [[search]] but
    * entities reachable from the anchors get graph_score 1.0 (centrality
    * otherwise), and each result carries its hop distance to the nearest
    * anchor (null = unreachable; the relational form of the reference's
    * path-to-anchor payload — the full node path is [[SemanticGraph.findPath]]).
    */
  def searchWithContext(entities: DataFrame, relations: DataFrame,
                        query: Array[Float], k: Int, anchors: Seq[Any],
                        config: Config = Config(),
                        idCol: String = "id"): DataFrame = {
    val reach = reachable(relations, anchors, config.maxContextHops)
      .select(col("id").as("__rid"), col("hop").as("anchor_hops"))
    val cent = degreeCentrality(entities, relations, idCol)
      .withColumnRenamed("id", "__cid")
    entities
      .join(cent, col(idCol) === col("__cid"), "left")
      .join(broadcast(reach), col(idCol).cast("string") === col("__rid"), "left")
      .withColumn("graph_score",
        when(col("__rid").isNotNull, lit(1.0))
          .otherwise(coalesce(col("graph_score"), lit(0.0))))
      .withColumn("similarity",
        lit(1.0) - Distances.distance("cosine", col("embedding"), lit(query)))
      .withColumn("combined_score",
        col("similarity") * config.similarityWeight +
          col("graph_score") * config.graphWeight)
      .drop("__cid", "__rid")
      .orderBy(col("combined_score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Neighbors of an entity with relation type + direction
    * (knowledge_graph.rs:304-334). Output: (id, relation, direction).
    */
  def neighbors(relations: DataFrame, entityId: String): DataFrame =
    relations.filter(col("source") === entityId)
      .select(col("target").as("id"), col("relation_type").as("relation"),
        lit("outgoing").as("direction"))
      .unionAll(relations.filter(col("target") === entityId)
        .select(col("source").as("id"), col("relation_type").as("relation"),
          lit("incoming").as("direction")))

  /** Induced subgraph around `centers` (knowledge_graph.rs:550-575):
    * entities reachable within `hops` + relations whose source is in the
    * reachable set (the reference iterates outgoing edges of members;
    * edges to non-members survive, matching :560-571).
    */
  def extractSubgraph(entities: DataFrame, relations: DataFrame,
                      centers: Seq[Any], hops: Int,
                      idCol: String = "id"): (DataFrame, DataFrame) = {
    val members = reachable(relations, centers, hops).select("id")
    val subEntities = entities.join(broadcast(members),
      entities(idCol).cast("string") === members("id"), "left_semi")
    val subRelations = relations.join(broadcast(members),
      relations("source").cast("string") === members("id"), "left_semi")
    (subEntities, subRelations)
  }

  /** Shortest undirected path between two entities as a node sequence
    * (knowledge_graph.rs:468-548): delegates to the shared BFS with the
    * relations flattened to undirected edges.
    */
  def findPath(relations: DataFrame, from: Any, to: Any,
               maxHops: Int = 10): Option[Seq[String]] = {
    val undirected = relations
      .select(col("source").cast("string").as("src"),
        col("target").cast("string").as("dst"))
      .unionAll(relations.select(col("target").cast("string").as("src"),
        col("source").cast("string").as("dst")))
    SemanticGraph.findPath(undirected, from, to, maxHops)
  }
}
