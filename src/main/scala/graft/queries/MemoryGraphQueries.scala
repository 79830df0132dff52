package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{AgentMemory, KnowledgeGraph}

/** Oracle gates for agentic memory (reference: src/experimental/
  * agentic_memory.rs) and the typed knowledge graph (experimental/
  * knowledge_graph.rs).
  *
  * The memory store derives from `embeddings`: six memory types cycle with
  * vec_id, importance steps 1.0..1.9, created_at walks back one hour per
  * id from a fixed epoch so ages (and therefore decay) vary per row; `now`
  * is pinned. The knowledge graph links vec_id → (vec_id·7+3) mod n — a
  * deterministic ring with varied in-degrees.
  */
object MemoryGraphQueries {

  private val storeCte =
    """st AS (
      |  SELECT vec_id AS id,
      |         CASE vec_id % 6 WHEN 0 THEN 'short_term' WHEN 1 THEN 'working'
      |              WHEN 2 THEN 'long_term' WHEN 3 THEN 'episodic'
      |              WHEN 4 THEN 'semantic' ELSE 'procedural' END AS memory_type,
      |         1.0 + (vec_id % 10) / 10.0 AS importance,
      |         1700000000 - vec_id * 3600 AS created_at,
      |         embedding
      |  FROM embeddings
      |)""".stripMargin

  private def store(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings").select(
      col("vec_id").as("id"),
      when(col("vec_id") % 6 === 0, "short_term")
        .when(col("vec_id") % 6 === 1, "working")
        .when(col("vec_id") % 6 === 2, "long_term")
        .when(col("vec_id") % 6 === 3, "episodic")
        .when(col("vec_id") % 6 === 4, "semantic")
        .otherwise("procedural").as("memory_type"),
      (lit(1.0) + (col("vec_id") % 10) / 10.0).as("importance"),
      (lit(1700000000L) - col("vec_id") * 3600).as("created_at"),
      lit(0L).as("last_accessed"), lit(0L).as("access_count"),
      col("embedding"))

  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray

  private val kgRelCte =
    """n AS (SELECT count(*) AS c FROM embeddings),
      |rel AS (
      |  SELECT vec_id AS source, (vec_id * 7 + 3) % (SELECT c FROM n) AS target
      |  FROM embeddings
      |),
      |deg AS (
      |  SELECT id, count(*) AS d
      |  FROM (SELECT source AS id FROM rel UNION ALL SELECT target FROM rel)
      |  GROUP BY id
      |)""".stripMargin

  /** Corpus size for the ring modulus: an EAGER `count()` folded to a
    * literal, deliberately — the r15 broadcast-1-row-aggregate
    * alternative (crossJoin(broadcast(groupBy().count()))) was tried and
    * MEASURED worse: the count subplan re-executes at every plan
    * reference of the derived frame (the 2-hop KG traversal references
    * `relations` several times), costing kg_context_search +0.35 s
    * min-of-7 at sf0.1, while the eager count runs ONCE (a metadata-
    * cheap parquet row-count) and the literal is free to reuse. Keep
    * the one tiny plan-build-time job (r14 verdict item 7, recorded
    * choice).
    */
  private def kgData(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val emb = Tables.load(s, dir, "embeddings")
    val n = emb.count()
    val entities = emb.select(col("vec_id").as("id"),
      when(col("vec_id") % 4 === 0, "person")
        .when(col("vec_id") % 4 === 1, "place")
        .when(col("vec_id") % 4 === 2, "org")
        .otherwise("concept").as("entity_type"),
      col("embedding"))
    val relations = emb.select(col("vec_id").as("source"),
      ((col("vec_id") * 7 + 3) % n).as("target"),
      when(col("vec_id") % 3 === 0, "knows")
        .when(col("vec_id") % 3 === 1, "near")
        .otherwise("part_of").as("relation_type"),
      lit(1.0).as("weight"))
    (entities, relations)
  }

  val defs: Map[String, Q] = Map(
    // Graph-augmented vector search (services/ai/graph_query.rs:94-180):
    // top-(2k) seeds by cosine, 2-hop typed-edge expansion (BFS min-hop,
    // ties to the smallest (path, edge_types) pair — see GraphQuery's
    // adjudication note), score = dist·0.6 + hops·0.4·0.1. Edges: 'next'
    // = vec_id+1, 'skip' = the KG ring (vec_id·7+3) mod n. The oracle
    // unrolls the two hop levels like kg_context_search does; string-id
    // paths join with '/', and elementwise array comparison equals the
    // joined-string comparison because ids are '/'-free and equal-hop
    // tied paths have equal length. The 0.4·0.1 weight multiplies as
    // DOUBLE on both sides so the fused scores are bit-identical.
    "graph_query_search" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |n AS (SELECT count(*) AS c FROM embeddings),
        |d AS (SELECT CAST(vec_id AS VARCHAR) AS id,
        |             round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS dist
        |      FROM embeddings, q),
        |e AS (
        |  SELECT CAST(vec_id AS VARCHAR) AS src,
        |         CAST(vec_id + 1 AS VARCHAR) AS dst, 'next' AS et
        |  FROM embeddings
        |  UNION ALL
        |  SELECT CAST(vec_id AS VARCHAR),
        |         CAST((vec_id * 7 + 3) % (SELECT c FROM n) AS VARCHAR), 'skip'
        |  FROM embeddings),
        |seeds AS (SELECT id, dist FROM d ORDER BY dist, id LIMIT 20),
        |x1 AS (
        |  SELECT e.dst AS id, s.id || '/' || e.dst AS path, e.et AS etypes
        |  FROM seeds s JOIN e ON s.id = e.src JOIN d dd ON dd.id = e.dst
        |  WHERE e.dst NOT IN (SELECT id FROM seeds)),
        |h1 AS (SELECT id, path, etypes FROM
        |         (SELECT x1.*, row_number() OVER (PARTITION BY id
        |            ORDER BY path, etypes) AS rn FROM x1) WHERE rn = 1),
        |x2 AS (
        |  SELECT e.dst AS id, h.path || '/' || e.dst AS path,
        |         h.etypes || '/' || e.et AS etypes
        |  FROM h1 h JOIN e ON h.id = e.src JOIN d dd ON dd.id = e.dst
        |  WHERE e.dst NOT IN (SELECT id FROM seeds)
        |    AND e.dst NOT IN (SELECT id FROM h1)),
        |h2 AS (SELECT id, path, etypes FROM
        |         (SELECT x2.*, row_number() OVER (PARTITION BY id
        |            ORDER BY path, etypes) AS rn FROM x2) WHERE rn = 1),
        |allr AS (
        |  SELECT id, 0 AS hops, id AS path, '' AS etypes FROM seeds
        |  UNION ALL SELECT id, 1, path, etypes FROM h1
        |  UNION ALL SELECT id, 2, path, etypes FROM h2)
        |SELECT a.id, d.dist AS vector_distance, a.hops, a.path,
        |       a.etypes AS edge_types,
        |       round(d.dist * 0.6::DOUBLE + a.hops * (0.4::DOUBLE * 0.1::DOUBLE), 6) AS score
        |FROM allr a JOIN d ON d.id = a.id
        |ORDER BY d.dist * 0.6::DOUBLE + a.hops * (0.4::DOUBLE * 0.1::DOUBLE), a.id
        |LIMIT 40""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      // eager count folded to a literal — see kgData's adjudication note
      // (the traversal references `edges` once per hop; a broadcast-count
      // subplan would re-execute per reference)
      val n = emb.count()
      val nodes = emb.select(col("vec_id").cast("string").as("id"),
        col("embedding").as("vector"))
      val edges = emb.select(col("vec_id").cast("string").as("src"),
          (col("vec_id") + 1).cast("string").as("dst"),
          lit("next").as("edge_type"))
        .unionByName(emb.select(col("vec_id").cast("string").as("src"),
          ((col("vec_id") * 7 + 3) % n).cast("string").as("dst"),
          lit("skip").as("edge_type")))
      // assignments, not search: the fused formula makes traversed rows
      // score behind every seed, so the k-cut would hide the hop/path
      // columns this gate exists to check (see GraphQuery.search scaladoc)
      graft.ops.GraphQuery.assignments(nodes, edges, queryVec(s, dir),
          k = 10, maxHops = 2, distanceColumn = c => round(c, 6))
        .orderBy(col("score").asc, col("id").asc).limit(40)
        .select(col("id"), col("vector_distance"), col("hops"),
          array_join(col("path"), "/").as("path"),
          array_join(col("edge_types"), "/").as("edge_types"),
          round(col("score"), 6).as("score"))
    },

    // Memory recall: 0.7·cosine + 0.3·decayed importance, exp half-life
    // 168 h (agentic_memory.rs:452-524), threshold 0 admits positive sims.
    "memory_recall" -> Q(
      s"""WITH $storeCte,
        |q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |sc AS (
        |  SELECT st.id, st.memory_type,
        |         list_cosine_similarity(st.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim,
        |         importance * pow(0.5, greatest(1700003600 - created_at, 0) / 3600.0 / 168.0) AS ei
        |  FROM st CROSS JOIN q
        |)
        |SELECT id, memory_type, round(sim, 6) AS similarity,
        |       round(ei, 6) AS effective_importance,
        |       round(0.7 * sim + 0.3 * ei, 6) AS relevance
        |FROM sc WHERE sim >= 0.0
        |ORDER BY 0.7 * sim + 0.3 * ei DESC, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      AgentMemory.recall(store(s, dir), queryVec(s, dir), k = 10,
          now = 1700003600L,
          AgentMemory.Config(recallThreshold = 0.0))
        .select(col("id"), col("memory_type"),
          round(col("similarity"), 6).as("similarity"),
          round(col("effective_importance"), 6).as("effective_importance"),
          round(col("relevance"), 6).as("relevance"))
    },

    // Context recall: (1−tw)·sim·eff_importance + tw·recency at tw = 0.4
    // (agentic_memory.rs:935-985).
    "memory_context_recall" -> Q(
      s"""WITH $storeCte,
        |q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |sc AS (
        |  SELECT st.id,
        |         list_cosine_similarity(st.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim,
        |         importance * pow(0.5, greatest(1700003600 - created_at, 0) / 3600.0 / 168.0) AS ei,
        |         pow(0.5, greatest(1700003600 - created_at, 0) / 3600.0 / 168.0) AS rec
        |  FROM st CROSS JOIN q
        |)
        |SELECT id, round(sim, 6) AS similarity,
        |       round(sim * ei * 0.6 + rec * 0.4, 6) AS relevance
        |FROM sc WHERE sim >= 0.0
        |ORDER BY sim * ei * 0.6 + rec * 0.4 DESC, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      AgentMemory.recallWithContext(store(s, dir), queryVec(s, dir), k = 10,
          timeWeight = 0.4, now = 1700003600L,
          AgentMemory.Config(recallThreshold = 0.0))
        .select(col("id"), round(col("similarity"), 6).as("similarity"),
          round(col("relevance"), 6).as("relevance"))
    },

    // Consolidation at threshold 1.2: short-term rows whose decayed
    // importance clears the bar flip to long_term (agentic_memory.rs:
    // 580-618); the gate checks the resulting type census.
    "memory_consolidate" -> Q(
      s"""WITH $storeCte,
        |after AS (
        |  SELECT CASE WHEN memory_type = 'short_term' AND
        |              importance * pow(0.5, greatest(1700003600 - created_at, 0) / 3600.0 / 168.0) >= 1.2
        |              THEN 'long_term' ELSE memory_type END AS memory_type
        |  FROM st
        |)
        |SELECT memory_type, count(*) AS n
        |FROM after GROUP BY memory_type ORDER BY memory_type""".stripMargin
    ) { (s, dir) =>
      AgentMemory.consolidate(store(s, dir), now = 1700003600L,
          AgentMemory.Config(consolidationThreshold = 1.2))
        .groupBy(col("memory_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("memory_type"))
    },

    // KG hybrid search: 0.7·cosine + 0.3·degree-centrality
    // (knowledge_graph.rs:337-385, 577-585).
    "kg_search" -> Q(
      s"""WITH $kgRelCte,
        |q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |sc AS (
        |  SELECT e.vec_id AS id,
        |         list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim,
        |         least(coalesce(d.d, 0)::DOUBLE / (SELECT c FROM n), 1.0) AS gs
        |  FROM embeddings e CROSS JOIN q LEFT JOIN deg d ON e.vec_id = d.id
        |)
        |SELECT id, round(sim, 6) AS similarity, round(gs, 6) AS graph_score,
        |       round(0.7 * sim + 0.3 * gs, 6) AS combined_score
        |FROM sc ORDER BY 0.7 * sim + 0.3 * gs DESC, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val (entities, relations) = kgData(s, dir)
      KnowledgeGraph.search(entities, relations, queryVec(s, dir), k = 10)
        .select(col("id"), round(col("similarity"), 6).as("similarity"),
          round(col("graph_score"), 6).as("graph_score"),
          round(col("combined_score"), 6).as("combined_score"))
    },

    // KG context search: entities within 2 undirected hops of the anchors
    // take graph_score 1.0 (knowledge_graph.rs:388-466). The oracle
    // unrolls the bounded BFS as explicit hop levels.
    "kg_context_search" -> Q(
      s"""WITH $kgRelCte,
        |und AS (SELECT source AS src, target AS dst FROM rel
        |        UNION ALL SELECT target, source FROM rel),
        |l0 AS (SELECT 5 AS id UNION ALL SELECT 10),
        |l1 AS (
        |  SELECT DISTINCT dst AS id FROM und JOIN l0 ON und.src = l0.id
        |  WHERE dst NOT IN (SELECT id FROM l0)
        |),
        |l2 AS (
        |  SELECT DISTINCT dst AS id FROM und JOIN l1 ON und.src = l1.id
        |  WHERE dst NOT IN (SELECT id FROM l0) AND dst NOT IN (SELECT id FROM l1)
        |),
        |reach AS (
        |  SELECT id, 0 AS hop FROM l0
        |  UNION ALL SELECT id, 1 FROM l1
        |  UNION ALL SELECT id, 2 FROM l2
        |),
        |q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |sc AS (
        |  SELECT e.vec_id AS id,
        |         list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim,
        |         CASE WHEN r.id IS NOT NULL THEN 1.0
        |              ELSE least(coalesce(d.d, 0)::DOUBLE / (SELECT c FROM n), 1.0) END AS gs,
        |         r.hop AS anchor_hops
        |  FROM embeddings e CROSS JOIN q
        |  LEFT JOIN deg d ON e.vec_id = d.id
        |  LEFT JOIN reach r ON e.vec_id = r.id
        |)
        |SELECT id, round(sim, 6) AS similarity, round(gs, 6) AS graph_score,
        |       round(0.7 * sim + 0.3 * gs, 6) AS combined_score, anchor_hops
        |FROM sc ORDER BY 0.7 * sim + 0.3 * gs DESC, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val (entities, relations) = kgData(s, dir)
      KnowledgeGraph.searchWithContext(entities, relations, queryVec(s, dir),
          k = 10, anchors = Seq(5L, 10L))
        .select(col("id"), round(col("similarity"), 6).as("similarity"),
          round(col("graph_score"), 6).as("graph_score"),
          round(col("combined_score"), 6).as("combined_score"),
          col("anchor_hops"))
    },
  )
}
