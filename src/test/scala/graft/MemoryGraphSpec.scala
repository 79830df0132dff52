package graft

import org.apache.spark.sql.functions._

import graft.ops.{AgentMemory, KnowledgeGraph}
import graft.ops.AgentMemory.{Config, Decay}

/** Agentic memory (reference: experimental/agentic_memory.rs) and typed
  * knowledge graph (experimental/knowledge_graph.rs).
  */
class MemoryGraphSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L

  private def mem(id: String, mtype: String, vec: Seq[Float],
                  importance: Double, createdAt: Long) =
    (id, mtype, vec, importance, createdAt, 0L, 0L)

  private def storeDf(rows: (String, String, Seq[Float], Double, Long, Long, Long)*) =
    rows.toDF("id", "memory_type", "embedding", "importance", "created_at",
      "last_accessed", "access_count")

  // --------------------------------------------------------------- decay

  test("decay functions match the reference formulas at pinned ages") {
    val df = Seq(0.0, 84.0, 168.0, 336.0).toDF("age")
    def eval(d: Decay) = df.select(AgentMemory.decayFactor(d, col("age")))
      .collect().map(_.getDouble(0)).toSeq
    assert(eval(Decay.NoDecay) == Seq(1.0, 1.0, 1.0, 1.0))
    val e = eval(Decay.Exponential(168.0))
    assert(math.abs(e(2) - 0.5) < 1e-12 && math.abs(e(1) - math.sqrt(0.5)) < 1e-12)
    // linear clamps at 0 once rate·age crosses 1 (168·0.01 = 1.68)
    assert(eval(Decay.Linear(0.01)) == Seq(1.0, 1.0 - 0.84, 0.0, 0.0))
    // step: floor(age/100)·0.3 → 0, 0, 0.7, 0.1
    val st = eval(Decay.Step(100.0, 0.3))
    assert(st.zip(Seq(1.0, 1.0, 0.7, 0.1)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    val p = eval(Decay.PowerLaw(1.0))
    assert(math.abs(p(2) - 1.0 / 169.0) < 1e-12)
  }

  // -------------------------------------------------------------- recall

  test("recall blends similarity and decayed importance; threshold filters") {
    val now = 1000 * H
    val st = storeDf(
      mem("exact-old", "long_term", Seq(1f, 0f), 1.0, now - 336 * H),
      mem("close-fresh", "long_term", Seq(0.9f, 0.1f), 1.0, now),
      mem("orthogonal", "long_term", Seq(0f, 1f), 9.9, now))
    val r = AgentMemory.recall(st, Array(1f, 0f), 3, now,
      Config(decay = Decay.Exponential(168.0), recallThreshold = 0.5))
      .select("id", "relevance").as[(String, Double)].collect()
    // orthogonal: cosine sim 0 < 0.5 → filtered despite huge importance
    assert(!r.exists(_._1 == "orthogonal"))
    // exact-old: sim 1 but importance decayed to 0.25 → 0.7 + 0.075
    val exact = r.find(_._1 == "exact-old").get._2
    assert(math.abs(exact - 0.775) < 1e-6)
    assert(r.head._1 == "close-fresh", "fresh near-match outranks decayed exact")
  }

  test("recallByType keeps the reference's over-fetch-then-filter quirk") {
    val now = 0L
    val st = storeDf(
      (1 to 6).map(i => mem(s"e$i", "episodic", Seq(1f, i * 0.001f), 1.0, now)) ++
        Seq(mem("s1", "semantic", Seq(1f, 0.1f), 1.0, now)): _*)
    // k=2 → over-fetch 4 from the full store, then filter episodic
    val r = AgentMemory.recallByType(st, Array(1f, 0f), "episodic", 2, now,
      Config(recallThreshold = 0.0))
    assert(r.collect().forall(_.getAs[String]("memory_type") == "episodic"))
    assert(r.count() == 2)
  }

  // ------------------------------------------------- lifecycle operators

  test("consolidate/promote/expire/evict reshape the store per the reference rules") {
    val now = 100 * H
    val st = storeDf(
      mem("keep-short", "short_term", Seq(1f, 0f), 1.0, now - H / 2),
      mem("important-short", "short_term", Seq(1f, 0f), 3.0, now - H / 2),
      mem("stale-short", "short_term", Seq(1f, 0f), 5.0, now - 2 * H),
      mem("long", "long_term", Seq(1f, 0f), 1.0, now - 2 * H))

    val cons = AgentMemory.consolidate(st, now, Config(consolidationThreshold = 2.0))
      .filter(col("memory_type") === "long_term").select("id")
      .as[String].collect().toSet
    assert(cons == Set("important-short", "stale-short", "long"))

    val prom = AgentMemory.promoteImportant(st, 4.0)
      .filter(col("memory_type") === "long_term").select("id")
      .as[String].collect().toSet
    assert(prom == Set("stale-short", "long"))

    val kept = AgentMemory.clearExpired(st, now, Config(shortTermTtlSecs = H))
      .select("id").as[String].collect().toSet
    assert(kept == Set("keep-short", "important-short", "long"),
      "only short-term-class rows past the TTL are dropped")

    val evicted = AgentMemory.enforceCapacity(st, now,
      Config(shortTermCapacity = 2, longTermCapacity = 10, decay = Decay.NoDecay))
      .select("id").as[String].collect().toSet
    assert(evicted == Set("important-short", "stale-short", "long"),
      "lowest-effective-importance short-term row evicted at capacity")
  }

  test("associate links new rows to similar long-term memories only, top-N") {
    val now = 0L
    val st = storeDf(
      mem("lt1", "long_term", Seq(1f, 0f), 1.0, now),
      mem("lt2", "long_term", Seq(0.95f, 0.05f), 1.0, now),
      mem("lt-far", "long_term", Seq(0f, 1f), 1.0, now),
      mem("short", "short_term", Seq(1f, 0f), 1.0, now))
    val fresh = storeDf(mem("new1", "long_term", Seq(1f, 0.01f), 1.0, now))
    val a = AgentMemory.associate(st, fresh, now,
      Config(associationThreshold = 0.7, maxAssociations = 1))
      .collect()
    assert(a.length == 1 && a.head.getString(0) == "new1")
    assert(a.head.getString(1) == "lt1", "top-1 by similarity; short-term excluded")
  }

  test("markAccessed boosts importance and stamps access metadata for recalled rows") {
    val st = storeDf(
      mem("hit", "long_term", Seq(1f, 0f), 1.0, 0L),
      mem("miss", "long_term", Seq(0f, 1f), 1.0, 0L))
    val recalled = Seq("hit").toDF("id")
    val after = AgentMemory.markAccessed(st, recalled, now = 42L)
      .select("id", "importance", "access_count", "last_accessed")
      .as[(String, Double, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(after("hit") == (("hit", 1.1, 1L, 42L)))
    assert(after("miss") == (("miss", 1.0, 0L, 0L)))
  }

  test("stats counts store classes") {
    val st = storeDf(
      mem("a", "short_term", Seq(1f), 1, 0), mem("b", "working", Seq(1f), 1, 0),
      mem("c", "episodic", Seq(1f), 1, 0), mem("d", "semantic", Seq(1f), 1, 0))
    val r = AgentMemory.stats(st).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 1 && r.getLong(2) == 1 &&
      r.getLong(3) == 2)
  }

  // ------------------------------------------------------ knowledge graph

  private def kg = {
    // path graph a-b-c-d plus isolated e; typed entities
    val entities = Seq(
      ("a", "person", Seq(1f, 0f)), ("b", "person", Seq(0.9f, 0.1f)),
      ("c", "org", Seq(0f, 1f)), ("d", "org", Seq(0.1f, 0.9f)),
      ("e", "person", Seq(0.5f, 0.5f)))
      .toDF("id", "entity_type", "embedding")
    val relations = Seq(("a", "b", "knows", 1.0), ("b", "c", "works_at", 1.0),
      ("c", "d", "partner_of", 1.0))
      .toDF("source", "target", "relation_type", "weight")
    (entities, relations)
  }

  test("degree centrality normalizes by entity count and caps at 1") {
    val (e, r) = kg
    val c = KnowledgeGraph.degreeCentrality(e, r)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(c("b") == 0.4 && c("a") == 0.2 && c("e") == 0.0)
  }

  test("search blends cosine and centrality; type filter narrows candidates") {
    val (e, r) = kg
    val top = KnowledgeGraph.search(e, r, Array(1f, 0f), k = 2)
      .select("id").as[String].collect()
    assert(top.head == "a" || top.head == "b")
    val orgs = KnowledgeGraph.search(e, r, Array(1f, 0f), k = 5,
      entityType = Some("org")).select("entity_type").as[String].collect()
    assert(orgs.nonEmpty && orgs.forall(_ == "org"))
  }

  test("searchWithContext boosts reachable entities and reports anchor hops") {
    val (e, r) = kg
    val res = KnowledgeGraph.searchWithContext(e, r, Array(0f, 1f), k = 5,
        anchors = Seq("a"))
      .select("id", "graph_score", "anchor_hops")
      .collect().map(x => x.getString(0) -> ((x.getDouble(1), Option(x.get(2))))).toMap
    // a,b,c within 2 undirected hops of anchor a → boosted to 1.0
    assert(res("a") == ((1.0, Some(0))) && res("b") == ((1.0, Some(1))) &&
      res("c") == ((1.0, Some(2))))
    // d is 3 hops out → centrality (degree 1 / 5 entities), no hop annotation
    assert(res("d") == ((0.2, None)))
    assert(res("e")._1 == 0.0)
  }

  test("extractSubgraph keeps reachable entities and their outgoing edges") {
    val (e, r) = kg
    val (se, sr) = KnowledgeGraph.extractSubgraph(e, r, Seq("b"), hops = 1)
    assert(se.select("id").as[String].collect().toSet == Set("a", "b", "c"))
    // outgoing edges of members — includes c→d (edge to a non-member,
    // matching the reference's member-source iteration)
    assert(sr.select("source", "target").as[(String, String)].collect().toSet ==
      Set(("a", "b"), ("b", "c"), ("c", "d")))
  }

  test("findPath walks relations undirected and neighbors reports direction") {
    val (_, r) = kg
    assert(KnowledgeGraph.findPath(r, "a", "d") == Some(Seq("a", "b", "c", "d")))
    assert(KnowledgeGraph.findPath(r, "d", "a") == Some(Seq("d", "c", "b", "a")))
    val nb = KnowledgeGraph.neighbors(r, "b")
      .collect().map(x => (x.getString(0), x.getString(2))).toSet
    assert(nb == Set(("c", "outgoing"), ("a", "incoming")))
  }
}
