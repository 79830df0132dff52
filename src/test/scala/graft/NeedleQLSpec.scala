package graft

import org.apache.spark.sql.functions._

import graft.needleql.{Ast, CollectionDef, NeedleSession, Parser}
import graft.needleql.Ast._

class NeedleQLParserSpec extends SparkSpec {

  test("full select clause stack parses") {
    val q = Parser.parseQuery(
      """SELECT id, distance FROM docs
        |WITH TIME_DECAY(exponential, half_life = 7d)
        |WHERE vector SIMILAR TO $q AND category = 'news' AND score >= 0.5
        |RERANK BY score DESC FETCH 30
        |ORDER BY distance ASC, id DESC
        |LIMIT 20 OFFSET 5""".stripMargin)
    assert(q.from == "docs")
    assert(q.select == SelectCols(Seq("id", "distance")))
    assert(q.timeDecay.contains(TimeDecayClause("exponential",
      Map("half_life" -> 604800.0))))
    assert(q.rerank.contains(RerankClause(RerankStrategy.Field("score", ascending = false), Some(30))))
    assert(q.orderBy == Seq(("distance", true), ("id", false)))
    assert(q.limit.contains(20L) && q.offset.contains(5L))
  }

  test("WITH clause order: TIME_DECAY before WHERE") {
    val q = Parser.parseQuery(
      "SELECT * FROM c WITH TIME_DECAY(linear, max_age = 2h) WHERE v SIMILAR TO $q")
    assert(q.timeDecay.contains(TimeDecayClause("linear", Map("max_age" -> 7200.0))))
  }

  test("TIME_DECAY without SIMILAR TO is rejected (parser.rs:896)") {
    assertThrows[Parser.ParseError](Parser.parseQuery(
      "SELECT * FROM c WITH TIME_DECAY(linear, max_age = 1h) WHERE x = 1"))
  }

  test("NEAREST_TO with metric and ef_search") {
    val q = Parser.parseQuery(
      "SELECT * FROM c NEAREST_TO([0.1, 0.2], 'euclidean', 100) LIMIT 5")
    assert(q.nearestTo.contains(NearestTo(Seq(0.1f, 0.2f), Some("euclidean"), Some(100))))
  }

  test("AS OF and HYBRID_SEARCH") {
    val q = Parser.parseQuery(
      "SELECT * FROM c HYBRID_SEARCH('hello world', [0.5, 0.5]) AS OF 12345 LIMIT 3")
    assert(q.asOf.contains(AsOfTimestamp(12345L)))
    assert(q.hybrid.exists(h => h.text == "hello world" && h.vector.contains(Seq(0.5f, 0.5f))))
  }

  test("SEARCH NEAR sugar") {
    val q = Parser.parseQuery("SEARCH NEAR $qv FROM docs WHERE tag = 'x' LIMIT 7")
    assert(q.from == "docs" && q.limit.contains(7L))
    assert(q.where.exists {
      case AndExpr(SimilarTo("vector", "qv"), _) => true
      case _ => false
    })
  }

  test("predicates: IN, NOT IN, BETWEEN, LIKE, IS NULL, <>") {
    val q = Parser.parseQuery(
      """SELECT * FROM c WHERE a IN ('x', 'y') AND b NOT IN (1, 2)
        |AND c BETWEEN 1 AND 5 AND d NOT LIKE '%junk%'
        |AND e IS NOT NULL AND f <> 3""".stripMargin)
    val w = q.where.get
    def flat(e: Expression): Seq[Expression] = e match {
      case AndExpr(l, r) => flat(l) ++ flat(r)
      case other => Seq(other)
    }
    val ps = flat(w)
    assert(ps.exists { case InList("a", _, false) => true; case _ => false })
    assert(ps.exists { case InList("b", _, true) => true; case _ => false })
    assert(ps.exists { case BetweenExpr("c", _, _, false) => true; case _ => false })
    assert(ps.exists { case LikeExpr("d", "%junk%", true) => true; case _ => false })
    assert(ps.exists { case IsNullExpr("e", true) => true; case _ => false })
    assert(ps.exists { case Comparison("f", "!=", NumLit(3.0)) => true; case _ => false })
  }

  test("statements: ddl, insert, delete, show") {
    assert(Parser.parse("CREATE COLLECTION foo WITH (dimensions = 4, distance = 'cosine')")
      == CreateCollectionStmt("foo", Map("dimensions" -> "4", "distance" -> "cosine")))
    assert(Parser.parse("DROP COLLECTION foo") == DropCollectionStmt("foo"))
    assert(Parser.parse("SHOW COLLECTIONS") == ShowCollectionsStmt)
    val ins = Parser.parse("""INSERT INTO foo VALUES ('a', [1.0, 2.0], '{"k": 1}')""")
    assert(ins == InsertStmt("foo", "a", Seq(1f, 2f), Some("""{"k": 1}""")))
    val del = Parser.parse("DELETE FROM foo WHERE id = 'a'")
    assert(del == DeleteStmt("foo", Some(Comparison("id", "=", StrLit("a")))))
  }

  test("duration literals") {
    val q = Parser.parseQuery("SELECT * FROM c WHERE age < 2h")
    assert(q.where.contains(Comparison("age", "<", DurationLit(7200L))))
  }
}

class NeedleQLExecSpec extends SparkSpec {
  import spark.implicits._

  private def session: NeedleSession = {
    val s = new NeedleSession(spark)
    val docs = Seq(
      ("a", Array(1f, 0f), "news", 10.0, "spark joins are fast"),
      ("b", Array(0.9f, 0.3f), "news", 5.0, "flink streams"),
      ("c", Array(0f, 1f), "blog", 8.0, "spark shuffles explained"),
    ).toDF("id", "vector", "category", "score", "text")
    s.register("docs", CollectionDef(docs, textCol = Some("text")))
    s.bind("q", Array(1f, 0f))
    s
  }

  test("SIMILAR TO end-to-end with filter") {
    val got = session.sql(
      "SELECT id, distance FROM docs WHERE vector SIMILAR TO $q AND category = 'news' LIMIT 2")
      .as[(String, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("a", "b"))
    assert(got.head._2 == 0.0)
  }

  test("MMR uses the query's own vector, not an arbitrary bound Float param") {
    val s = session
    // decoy: an unrelated Array[Float] param that must NOT become the MMR
    // query vector (regression: collectFirst over params.values picked it)
    s.bind("aaa_decoy", Array(0f, 1f))
    val got = s.sql(
      "SELECT id FROM docs WHERE vector SIMILAR TO $q RERANK BY MMR(1.0) LIMIT 2")
      .as[String].collect().toSeq
    // λ=1.0 → pure relevance to q=[1,0]: a (d=0) then b; the decoy [0,1]
    // would instead seed with c
    assert(got == Seq("a", "b"))
  }

  test("NEAREST_TO literal vector with metric override") {
    val got = session.sql(
      "SELECT id FROM docs NEAREST_TO([0.0, 1.0], 'euclidean') LIMIT 1")
      .as[String].collect().toSeq
    assert(got == Seq("c"))
  }

  test("plain metadata select with order/limit/offset") {
    val got = session.sql(
      "SELECT id FROM docs WHERE score >= 5 ORDER BY score DESC LIMIT 3 OFFSET 1")
      .as[String].collect().toSeq
    assert(got == Seq("c", "b"))
  }

  test("offset applies after vector search of k rows (executor.rs:193-197)") {
    val got = session.sql(
      "SELECT id FROM docs WHERE vector SIMILAR TO $q LIMIT 2 OFFSET 1")
      .as[String].collect().toSeq
    assert(got == Seq("b")) // k=2 fetched, first skipped
  }

  test("LIKE compiles to contains (trimmed %)") {
    val got = session.sql(
      "SELECT id FROM docs WHERE text LIKE '%spark%' ORDER BY id LIMIT 10")
      .as[String].collect().toSeq
    assert(got == Seq("a", "c"))
  }

  test("HYBRID_SEARCH fuses text and vector legs") {
    val got = session.sql(
      "SELECT id, rrf_score FROM docs HYBRID_SEARCH('spark', [1.0, 0.0]) LIMIT 3")
      .as[(String, Double)].collect()
    assert(got.nonEmpty)
    assert(got.head._1 == "a") // best in both legs
  }

  test("RERANK BY CrossEncoder: TermOverlap fallback + FETCH over-fetch") {
    val s = session
    // no scorer registered for 'missing' -> deterministic TermOverlap
    // fallback (the reference's no-provider behavior, reranker.rs:192):
    // both a and c contain 'spark'; 'shuffles' appears only in c
    val got = s.sql(
      "SELECT id, ce_score FROM docs HYBRID_SEARCH('spark shuffles', [1.0, 0.0]) RERANK BY CrossEncoder('missing') FETCH 3 LIMIT 2")
      .as[(String, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("c", "a")) // c matches both terms
    assert(got.head._2 > got(1)._2)
  }

  test("RERANK BY CrossEncoder honors a registered pluggable scorer") {
    val s = session
    // scorer that inverts relevance: rewards absence of the query term
    s.registerCrossEncoder("inverse", (_, text) =>
      if (text.contains("spark")) 0.0 else 1.0)
    val got = s.sql(
      "SELECT id FROM docs HYBRID_SEARCH('spark', [1.0, 0.0]) RERANK BY CrossEncoder('inverse') FETCH 3 LIMIT 1")
      .as[String].collect().toSeq
    assert(got == Seq("b")) // only b ('flink streams') lacks 'spark'
  }

  test("BM25 index cache is version-keyed: mutation evicts, search sees new docs") {
    val s = session
    // warm the cache on version 1
    s.sql("SELECT id FROM docs HYBRID_SEARCH('spark', [1.0, 0.0]) LIMIT 3").collect()
    // commit a new version with a doc that dominates the text leg
    val docs2 = Seq(
      ("a", Array(1f, 0f), "news", 10.0, "spark joins are fast"),
      ("b", Array(0.9f, 0.3f), "news", 5.0, "flink streams"),
      ("c", Array(0f, 1f), "blog", 8.0, "spark shuffles explained"),
      ("d", Array(0.95f, 0.1f), "news", 9.0, "quux quux quux"),
    ).toDF("id", "vector", "category", "score", "text")
    s.register("docs", CollectionDef(docs2, textCol = Some("text")))
    // a stale (version-1) index has no 'quux' postings at all → 'd' absent
    val got = s.sql(
      "SELECT id FROM docs HYBRID_SEARCH('quux', [0.95, 0.1]) LIMIT 2")
      .as[String].collect().toSeq
    assert(got.contains("d"))
  }

  test("ddl + insert + delete round-trip") {
    val s = session
    s.sql("CREATE COLLECTION tmp WITH (dimensions = 2)")
    assert(s.sql("SHOW COLLECTIONS").as[String].collect().contains("tmp"))
    s.sql("""INSERT INTO tmp VALUES ('x', [1.0, 0.0], '{"k": 1}')""")
    s.sql("""INSERT INTO tmp VALUES ('y', [0.0, 1.0], '{"k": 2}')""")
    assert(s.collections("tmp").df.count() == 2)
    s.sql("DELETE FROM tmp WHERE id = 'x'")
    assert(s.collections("tmp").df.select("id").as[String].collect().toSeq == Seq("y"))
    s.sql("DROP COLLECTION tmp")
    assert(!s.sql("SHOW COLLECTIONS").as[String].collect().contains("tmp"))
  }

  test("EXPLAIN returns plan narrative + spark plan") {
    val got = session.sql(
      "EXPLAIN SELECT id FROM docs WHERE vector SIMILAR TO $q AND category = 'news' LIMIT 5")
    val kinds = got.select("kind").as[String].collect().toSeq
    val details = got.select("detail").as[String].collect().mkString("\n")
    assert(kinds.contains("plan") && kinds.contains("spark"))
    assert(details.contains("VectorSearch") && details.contains("MetadataFilter"))
  }

  test("time decay with deterministic clock") {
    val s = session
    val docs = Seq(
      ("old", Array(1f, 0f), 0L),
      ("new", Array(0.9f, 0.3f), 900L)).toDF("id", "vector", "inserted_at")
    s.register("timed", CollectionDef(docs, insertedAtCol = Some("inserted_at")))
    s.nowEpochS = Some(1000L)
    val got = s.sql(
      "SELECT id FROM timed WITH TIME_DECAY(linear, max_age = 500) WHERE vector SIMILAR TO $q LIMIT 2")
      .as[String].collect().toSeq
    // old: age 1000 >= 500 -> factor 0 -> f32::MAX; new wins despite distance
    assert(got == Seq("new", "old"))
  }

  test("AS OF VERSION and SNAPSHOT time-travel") {
    val s = session
    s.createSnapshot("docs", "before")
    s.sql("INSERT INTO docs VALUES ('d', [0.5, 0.5])")
    assert(s.sql("SELECT id FROM docs WHERE score >= 0 OR score IS NULL LIMIT 10").count() == 4)
    // version 1 = as registered (3 rows); version 2 = after insert (4 rows)
    assert(s.sql("SELECT id FROM docs AS OF VERSION 1 LIMIT 10").count() == 3)
    assert(s.sql("SELECT id FROM docs AS OF VERSION 2 LIMIT 10").count() == 4)
    // named snapshot captures pre-insert state; '@name' expr form too
    assert(s.sql("SELECT id FROM docs AS OF SNAPSHOT 'before' LIMIT 10").count() == 3)
    assert(s.sql("SELECT id FROM docs AS OF '@before' LIMIT 10").count() == 3)
    assert(s.listSnapshots("docs") == Seq("before"))
    // snapshots hidden from SHOW COLLECTIONS (database/mod.rs:694-701)
    assert(!s.sql("SHOW COLLECTIONS").as[String].collect().exists(_.startsWith("__snapshot__")))
    // restore rolls the live collection back
    s.restoreSnapshot("docs", "before")
    assert(s.sql("SELECT id FROM docs LIMIT 10").count() == 3)
  }

  test("AS OF time expressions resolve against the deterministic clock") {
    val s = session
    val docs = Seq(
      ("early", Array(1f, 0f), 100L),
      ("late", Array(0f, 1f), 90000L)).toDF("id", "vector", "inserted_at")
    s.register("tt", CollectionDef(docs, insertedAtCol = Some("inserted_at")))
    s.nowEpochS = Some(100000L)
    // '1 day ago' = 100000 - 86400 = 13600 → only 'early' qualifies
    assert(s.sql("SELECT id FROM tt AS OF '1 day ago' LIMIT 10")
      .as[String].collect().toSeq == Seq("early"))
    // AS OF TIMESTAMP form
    assert(s.sql("SELECT id FROM tt AS OF TIMESTAMP 95000 LIMIT 10").count() == 2)
  }
}

class TimeExprSpec extends SparkSpec {
  import graft.needleql.TimeExpr
  private val now = 1000000L // epoch + ~11.6 days

  test("named, relative, dow, snapshot expressions (time_travel.rs:173-360)") {
    assert(TimeExpr.resolve(TimeExpr.parse("now"), now) == now)
    assert(TimeExpr.resolve(TimeExpr.parse("yesterday"), now) == now - 86400)
    assert(TimeExpr.resolve(TimeExpr.parse("last week"), now) == now - 604800)
    assert(TimeExpr.resolve(TimeExpr.parse("2 hours ago"), now) == now - 7200)
    assert(TimeExpr.resolve(TimeExpr.parse("in 3 days"), now) == now + 3 * 86400)
    assert(TimeExpr.resolve(TimeExpr.parse("hour ago"), now) == now - 3600)
    assert(TimeExpr.resolve(TimeExpr.parse("today"), now) == now - (now % 86400))
    // day-of-week arithmetic: epoch day 11 → (11+4)%7 = 1 = Monday;
    // last Friday is 3 days back, rounded to start-of-day
    val lastFri = TimeExpr.resolve(TimeExpr.parse("last friday"), now)
    assert(lastFri == (now - 3 * 86400) / 86400 * 86400)
    // same-dow goes a full week back
    val lastMon = TimeExpr.resolve(TimeExpr.parse("last monday"), now)
    assert(lastMon == (now - 7 * 86400) / 86400 * 86400)
    assert(TimeExpr.parse("snapshot:x") == TimeExpr.AtSnapshot("x"))
    // prefix match is case-insensitive AND stripped case-insensitively
    // (regression: 'Snapshot:foo' kept the prefix in the snapshot name)
    assert(TimeExpr.parse("Snapshot:x") == TimeExpr.AtSnapshot("x"))
    assert(TimeExpr.parse("SNAPSHOT:x") == TimeExpr.AtSnapshot("x"))
    assert(TimeExpr.parse("@release-1") == TimeExpr.AtSnapshot("release-1"))
    assert(TimeExpr.parse("12345") == TimeExpr.Timestamp(12345L))
    assertThrows[graft.needleql.Parser.ParseError](TimeExpr.parse("banana o'clock"))
  }
}

class NeedleQLRagSpec extends SparkSpec {
  import spark.implicits._

  test("USING RAG(deduplicate=true) drops near-duplicate retrieved texts") {
    val s = new graft.needleql.NeedleSession(spark)
    val base = "spark joins are fast and furious with broadcast hash tables enabled"
    val docs = Seq(
      ("a", Array(1f, 0f), base),
      ("b", Array(0.98f, 0.1f), base + " indeed"), // near-dup of a (jaccard > 0.9)
      ("c", Array(0.9f, 0.3f), "flink streams process events continuously"),
    ).toDF("id", "vector", "text")
    s.register("docs", graft.needleql.CollectionDef(docs, textCol = Some("text")))
    val got = s.sql(
      "SELECT id FROM docs HYBRID_SEARCH('spark', [1.0, 0.0]) USING RAG(deduplicate = true) LIMIT 3")
      .as[String].collect().toSeq
    assert(got.contains("a") && !got.contains("b")) // first occurrence wins
  }

  test("USING RAG(rerank=true) re-scores the retrieved set by term overlap") {
    val s = new graft.needleql.NeedleSession(spark)
    val docs = Seq(
      ("a", Array(1f, 0f), "unrelated words entirely present here"),
      ("b", Array(0.9f, 0.2f), "spark tuning"), // short + overlapping: max score
      ("c", Array(0.8f, 0.4f), "some spark content in a longer document"),
    ).toDF("id", "vector", "text")
    s.register("docs", graft.needleql.CollectionDef(docs, textCol = Some("text")))
    val got = s.sql(
      "SELECT id FROM docs HYBRID_SEARCH('spark', [1.0, 0.0]) USING RAG(rerank = true) LIMIT 3")
      .as[String].collect().toSeq
    // vector order would put a first; term-overlap rerank scores a = 0 and
    // prefers the short overlapping doc (idf/√doc_len): b, then c, then a
    assert(got == Seq("b", "c", "a"))
  }

  test("USING RAG hybrid_alpha overrides fusion weight; gaussian decay parses+runs") {
    val s = new graft.needleql.NeedleSession(spark)
    val docs = Seq(
      ("a", Array(1f, 0f), "spark joins are fast", 900L),
      ("b", Array(0.9f, 0.3f), "flink streams", 500L),
      ("c", Array(0f, 1f), "spark shuffles explained", 100L),
    ).toDF("id", "vector", "text", "inserted_at")
    s.register("docs", graft.needleql.CollectionDef(docs,
      textCol = Some("text"), insertedAtCol = Some("inserted_at")))
    s.bind("q", Array(1f, 0f))
    s.nowEpochS = Some(1000L)
    // alpha=1.0: vector leg dominates entirely -> id a first
    val got = s.sql(
      "SELECT id FROM docs HYBRID_SEARCH('spark', [1.0, 0.0]) USING RAG(hybrid_alpha = 1.0, top_k = 3) LIMIT 2")
      .as[String].collect().toSeq
    assert(got.head == "a" && got.size == 2)
    // gaussian decay compiles and re-ranks by age
    val g = s.sql(
      "SELECT id FROM docs WITH TIME_DECAY(gaussian, sigma = 200) WHERE vector SIMILAR TO $q LIMIT 3")
      .as[String].collect().toSeq
    assert(g.nonEmpty)
  }
}
