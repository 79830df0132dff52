package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.server.RestApi

/** Contract tests for the REST layer (reference: src/server/mod.rs route
  * table + types.rs bodies): exercised through the pure
  * (method, path, body) → (status, json) dispatch — no sockets — plus one
  * live round-trip through the JDK HttpServer host.
  */
class RestApiSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private def api = {
    val a = new RestApi(spark)
    a.nowEpochS = () => 1700000000L
    val (s, _) = a.handle("POST", "/collections",
      """{"name":"docs","dimensions":3,"distance":"cosine"}""")
    assert(s == 201)
    a
  }

  private def insert(a: RestApi, id: String, v: Seq[Double],
                     meta: String = null, ttl: Long = -1): Unit = {
    val m = if (meta == null) "" else s""","metadata":$meta"""
    val t = if (ttl < 0) "" else s""","ttl_seconds":$ttl"""
    val (s, body) = a.handle("POST", "/collections/docs/vectors",
      s"""{"id":"$id","vector":[${v.mkString(",")}]$m$t}""")
    assert(s == 200, body)
  }

  test("collection lifecycle: create/list/info/delete, error shapes") {
    val a = api
    // duplicate create → 409 with the reference error body {error, code}
    val (dup, dupBody) = a.handle("POST", "/collections",
      """{"name":"docs","dimensions":3}""")
    assert(dup == 409)
    val err = mapper.readTree(dupBody)
    assert(err.get("code").asText() == "ALREADY_EXISTS")
    assert(err.get("error").asText().nonEmpty)
    // bad dims → INVALID_DIMENSIONS (handlers/collections.rs guard)
    val (bad, badBody) = a.handle("POST", "/collections",
      """{"name":"x","dimensions":0}""")
    assert(bad == 400 &&
      mapper.readTree(badBody).get("code").asText() == "INVALID_DIMENSIONS")
    insert(a, "v1", Seq(1, 0, 0))
    val (_, list) = a.handle("GET", "/collections?offset=0&limit=10", "")
    val l = mapper.readTree(list)
    assert(l.get("collections").get(0).get("name").asText() == "docs")
    assert(l.get("collections").get(0).get("count").asLong() == 1L)
    assert(l.get("pagination").get("total").asInt() == 1)
    val (_, info) = a.handle("GET", "/collections/docs", "")
    val i = mapper.readTree(info)
    assert(i.get("dimensions").asInt() == 3 && i.get("count").asLong() == 1L)
    assert(a.handle("DELETE", "/collections/docs", "")._1 == 200)
    assert(a.handle("GET", "/collections/docs", "")._1 == 404)
  }

  test("vector CRUD: insert/dup/upsert/get/delete, dimension guard") {
    val a = api
    insert(a, "v1", Seq(1, 0, 0), meta = """{"cat":"a","n":5}""")
    // duplicate id → 409; upsert replaces
    val (dup, _) = a.handle("POST", "/collections/docs/vectors",
      """{"id":"v1","vector":[0,1,0]}""")
    assert(dup == 409)
    val (up, _) = a.handle("POST", "/collections/docs/vectors/upsert",
      """{"id":"v1","vector":[0,1,0],"metadata":{"cat":"b"}}""")
    assert(up == 200)
    val (gs, got) = a.handle("GET", "/collections/docs/vectors/v1", "")
    assert(gs == 200)
    val g = mapper.readTree(got)
    assert(g.get("vector").get(1).asDouble() == 1.0)
    assert(g.get("metadata").get("cat").asText() == "b")
    // wrong dims → DIMENSION_MISMATCH
    val (dm, dmBody) = a.handle("POST", "/collections/docs/vectors",
      """{"id":"v2","vector":[1,2]}""")
    assert(dm == 400 &&
      mapper.readTree(dmBody).get("code").asText() == "DIMENSION_MISMATCH")
    assert(a.handle("DELETE", "/collections/docs/vectors/v1", "")._1 == 200)
    assert(a.handle("GET", "/collections/docs/vectors/v1", "")._1 == 404)
    // deleted_count feeds needs_compaction
    val (_, info) = a.handle("GET", "/collections/docs", "")
    assert(mapper.readTree(info).get("deleted_count").asLong() == 1L)
  }

  test("within-batch duplicate ids: insert conflicts, upsert keeps last") {
    val a = api
    val (dup, dupBody) = a.handle("POST", "/collections/docs/vectors/batch",
      """{"vectors":[{"id":"v1","vector":[1,0,0]},{"id":"v1","vector":[0,1,0]}]}""")
    assert(dup == 409 &&
      mapper.readTree(dupBody).get("code").asText() == "DUPLICATE_ID")
    assert(mapper.readTree(a.handle("POST", "/collections/docs/count",
      "{}")._2).get("count").asLong() == 0L, "conflicted batch inserts nothing")
    // upsert path: last occurrence wins (sequential upsert semantics)
    val (us, ub) = a.handle("POST", "/collections/docs/vectors/upsert",
      """{"id":"v1","vector":[1,0,0]}""")
    assert(us == 200 && mapper.readTree(ub).get("upserted").asInt() == 1)
  }

  test("search: top-k order, score=1/(1+d), filter, cursor paging") {
    val a = api
    insert(a, "v1", Seq(1, 0, 0), meta = """{"cat":"a"}""")
    insert(a, "v2", Seq(0.9, 0.1, 0), meta = """{"cat":"b"}""")
    insert(a, "v3", Seq(0, 1, 0), meta = """{"cat":"a"}""")
    insert(a, "v4", Seq(0, 0.9, 0.1), meta = """{"cat":"a"}""")
    val (s, body) = a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"k":2,"include_vectors":true}""")
    assert(s == 200)
    val r = mapper.readTree(body)
    val rs = r.get("results")
    assert(rs.size() == 2)
    assert(rs.get(0).get("id").asText() == "v1")
    assert(rs.get(1).get("id").asText() == "v2")
    val d0 = rs.get(0).get("distance").asDouble()
    assert(math.abs(rs.get(0).get("score").asDouble() - 1.0 / (1.0 + d0)) < 1e-12)
    assert(rs.get(0).get("vector").size() == 3)
    assert(r.get("has_more").asBoolean())
    // cursor continues strictly after the last (distance, id)
    val cur = r.get("next_cursor")
    val (_, page2) = a.handle("POST", "/collections/docs/search",
      s"""{"vector":[1,0,0],"k":2,"search_after":${cur.toString}}""")
    val ids2 = mapper.readTree(page2).get("results")
    assert(ids2.get(0).get("id").asText() != "v1")
    // metadata pre-filter
    val (_, filtered) = a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"k":10,"filter":{"cat":{"$eq":"a"}}}""")
    val fIds = mapper.readTree(filtered).get("results")
    assert((0 until fIds.size()).map(i => fIds.get(i).get("id").asText())
      .toSet == Set("v1", "v3", "v4"))
  }

  test("batch + radius + count + metadata query + recommend") {
    val a = api
    insert(a, "v1", Seq(1, 0, 0), meta = """{"cat":"a"}""")
    insert(a, "v2", Seq(0, 1, 0), meta = """{"cat":"b"}""")
    insert(a, "v3", Seq(0, 0, 1), meta = """{"cat":"a"}""")
    val (_, batch) = a.handle("POST", "/collections/docs/search/batch",
      """{"vectors":[[1,0,0],[0,1,0]],"k":1}""")
    val b = mapper.readTree(batch).get("results")
    assert(b.size() == 2)
    assert(b.get(0).get(0).get("id").asText() == "v1")
    assert(b.get(1).get(0).get("id").asText() == "v2")
    val (_, rad) = a.handle("POST", "/collections/docs/search/radius",
      """{"vector":[1,0,0],"max_distance":0.5,"limit":10}""")
    assert(mapper.readTree(rad).get("count").asInt() == 1)
    val (_, cnt) = a.handle("POST", "/collections/docs/count",
      """{"filter":{"cat":{"$eq":"a"}}}""")
    assert(mapper.readTree(cnt).get("count").asLong() == 2L)
    val (mqs, mq) = a.handle("POST", "/collections/docs/query",
      """{"filter":{"cat":{"$eq":"a"}},"limit":1}""")
    assert(mqs == 200)
    val m = mapper.readTree(mq)
    assert(m.get("data").size() == 1)
    assert(m.get("pagination").get("total").asLong() == 2L)
    assert(m.get("pagination").get("has_more").asBoolean())
    // missing filter on /query → the reference's MISSING_FILTER error
    assert(mapper.readTree(a.handle("POST", "/collections/docs/query",
      "{}")._2).get("code").asText() == "MISSING_FILTER")
    val (_, rec) = a.handle("POST", "/collections/docs/recommend",
      """{"positive_ids":["v1"],"limit":2}""")
    val rr = mapper.readTree(rec).get("results")
    assert(rr.size() > 0 && rr.get(0).get("id").asText() != "v1",
      "seeds excluded from recommendations")
  }

  test("ttl_seconds expires rows from every read path") {
    val a = api
    insert(a, "v1", Seq(1, 0, 0), ttl = 100)   // expires at 1700000100
    insert(a, "v2", Seq(0, 1, 0))
    val (_, c1) = a.handle("POST", "/collections/docs/count", "{}")
    assert(mapper.readTree(c1).get("count").asLong() == 2L)
    a.nowEpochS = () => 1700000200L // past v1's expiry
    val (_, c2) = a.handle("POST", "/collections/docs/count", "{}")
    assert(mapper.readTree(c2).get("count").asLong() == 1L)
    val (_, sr) = a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"k":10}""")
    val ids = mapper.readTree(sr).get("results")
    assert((0 until ids.size()).map(i => ids.get(i).get("id").asText())
      .toSet == Set("v2"))
  }

  test("request validation: non-positive k/limit and oversized offset") {
    val a = api
    insert(a, "v1", Seq(1, 0, 0), meta = """{"cat":"a"}""")
    val (ks, kb) = a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"k":0}""")
    assert(ks == 400 &&
      mapper.readTree(kb).get("code").asText() == "INVALID_K")
    assert(a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"k":-5}""")._1 == 400)
    assert(a.handle("POST", "/collections/docs/search/batch",
      """{"vectors":[[1,0,0]],"k":0}""")._1 == 400)
    assert(a.handle("POST", "/collections/docs/search/radius",
      """{"vector":[1,0,0],"max_distance":1,"limit":0}""")._1 == 400)
    assert(a.handle("POST", "/collections/docs/recommend",
      """{"positive_ids":["v1"],"limit":0}""")._1 == 400)
    // /query offset is capped: limit(offset+limit) is driver-collected,
    // so an unbounded offset would materialize the whole collection
    val (os, ob) = a.handle("POST", "/collections/docs/query",
      """{"filter":{"cat":{"$eq":"a"}},"offset":1000000}""")
    assert(os == 400 &&
      mapper.readTree(ob).get("code").asText() == "INVALID_OFFSET")
    assert(a.handle("POST", "/collections/docs/query",
      """{"filter":{"cat":{"$eq":"a"}},"offset":-1}""")._1 == 400)
  }

  test("search_after cursor honors post_filter on every page") {
    val a = api
    // 6 rows at increasing distance from [1,0,0], alternating categories
    val vecs = Seq(
      ("v1", Seq(1.0, 0.0, 0.0), "a"), ("v2", Seq(0.9, 0.1, 0.0), "b"),
      ("v3", Seq(0.8, 0.2, 0.0), "a"), ("v4", Seq(0.6, 0.4, 0.0), "b"),
      ("v5", Seq(0.4, 0.6, 0.0), "a"), ("v6", Seq(0.2, 0.8, 0.0), "b"))
    vecs.foreach { case (id, v, cat) =>
      insert(a, id, v, meta = s"""{"cat":"$cat"}""") }
    val pf = """"post_filter":{"cat":{"$eq":"a"}}"""
    val (s1, p1) = a.handle("POST", "/collections/docs/search",
      s"""{"vector":[1,0,0],"k":2,$pf}""")
    assert(s1 == 200)
    val r1 = mapper.readTree(p1)
    val ids1 = (0 until r1.get("results").size())
      .map(i => r1.get("results").get(i).get("id").asText())
    assert(ids1 == Seq("v1", "v3"), s"page 1 filtered: $ids1")
    val cur = r1.get("next_cursor")
    val (s2, p2) = a.handle("POST", "/collections/docs/search",
      s"""{"vector":[1,0,0],"k":2,$pf,"search_after":${cur.toString}}""")
    assert(s2 == 200)
    val r2 = mapper.readTree(p2)
    val ids2 = (0 until r2.get("results").size())
      .map(i => r2.get("results").get(i).get("id").asText())
    assert(ids2 == Seq("v5"), s"page 2 must stay filtered: $ids2")
  }

  test("concurrent inserts and searches against the shared registry") {
    val a = api
    insert(a, "seed", Seq(1, 0, 0))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val done = new java.util.concurrent.CountDownLatch(8)
    (0 until 8).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          (0 until 5).foreach { i =>
            val (is, ib) = a.handle("POST", "/collections/docs/vectors",
              s"""{"id":"t$t-$i","vector":[0.1,${0.01 * t},${0.01 * i}]}""")
            assert(is == 200, ib)
            val (ss, sb) = a.handle("POST", "/collections/docs/search",
              """{"vector":[1,0,0],"k":3}""")
            assert(ss == 200, sb)
            assert(mapper.readTree(sb).get("results").size() > 0)
          }
        } catch { case e: Throwable => errors.add(e) }
        finally done.countDown()
      })
    }
    assert(done.await(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(errors.isEmpty, s"concurrent failures: ${errors.peek()}")
    val (_, cnt) = a.handle("POST", "/collections/docs/count", "{}")
    assert(mapper.readTree(cnt).get("count").asLong() == 41L,
      "all 40 concurrent inserts + seed visible")
  }

  test("metadata query pages by keyset cursor at constant cost") {
    val a = api
    (1 to 7).foreach(i =>
      insert(a, f"v$i%02d", Seq(i * 0.1, 0, 0), meta = """{"cat":"a"}"""))
    def page(cursor: Option[String]) = {
      val cur = cursor.map(c => s""","after_id":"$c"""").getOrElse("")
      val (s, b) = a.handle("POST", "/collections/docs/query",
        s"""{"filter":{"cat":{"$$eq":"a"}},"limit":3$cur}""")
      assert(s == 200, b)
      mapper.readTree(b)
    }
    val p1 = page(None)
    val ids1 = (0 until p1.get("data").size())
      .map(i => p1.get("data").get(i).get("id").asText())
    assert(ids1 == Seq("v01", "v02", "v03"))
    assert(p1.get("pagination").get("has_more").asBoolean())
    val p2 = page(Some(p1.get("pagination").get("next_after_id").asText()))
    val ids2 = (0 until p2.get("data").size())
      .map(i => p2.get("data").get(i).get("id").asText())
    assert(ids2 == Seq("v04", "v05", "v06"))
    val p3 = page(Some(p2.get("pagination").get("next_after_id").asText()))
    assert((0 until p3.get("data").size())
      .map(i => p3.get("data").get(i).get("id").asText()) == Seq("v07"))
    assert(!p3.get("pagination").get("has_more").asBoolean())
    // cursor and offset are mutually exclusive
    assert(a.handle("POST", "/collections/docs/query",
      """{"filter":{"cat":{"$eq":"a"}},"offset":2,"after_id":"v01"}""")._1
      == 400)
  }

  test("vector listing pages by keyset and carries vectors + metadata") {
    val a = api
    (1 to 5).foreach(i =>
      insert(a, f"v$i%02d", Seq(i * 0.1, 0, 0), meta = s"""{"n":"$i"}"""))
    val (s1, b1) = a.handle("GET", "/collections/docs/vectors?limit=3", "")
    assert(s1 == 200, b1)
    val p1 = mapper.readTree(b1)
    val ids1 = (0 until p1.get("vectors").size())
      .map(i => p1.get("vectors").get(i).get("id").asText())
    assert(ids1 == Seq("v01", "v02", "v03"))
    assert(p1.get("vectors").get(0).get("vector").size() == 3)
    assert(p1.get("vectors").get(0).get("metadata").get("n").asText() == "1")
    assert(p1.get("pagination").get("has_more").asBoolean())
    val cur = p1.get("pagination").get("next_after_id").asText()
    val (s2, b2) = a.handle("GET",
      s"/collections/docs/vectors?limit=3&after_id=$cur", "")
    assert(s2 == 200, b2)
    val p2 = mapper.readTree(b2)
    assert((0 until p2.get("vectors").size())
      .map(i => p2.get("vectors").get(i).get("id").asText())
      == Seq("v04", "v05"))
  }

  test("exact-boundary final page reports has_more=false") {
    val a = api
    (1 to 6).foreach(i =>
      insert(a, f"v$i%02d", Seq(i * 0.1, 0, 0), meta = s"""{"n":"$i"}"""))
    // 6 rows, limit 3 → page 2 is exactly full AND final
    val (_, b1) = a.handle("GET", "/collections/docs/vectors?limit=3", "")
    val cur = mapper.readTree(b1).get("pagination").get("next_after_id").asText()
    val (_, b2) = a.handle("GET",
      s"/collections/docs/vectors?limit=3&after_id=$cur", "")
    val p2 = mapper.readTree(b2)
    assert(p2.get("vectors").size() == 3)
    assert(!p2.get("pagination").get("has_more").asBoolean(), b2)
    // same for the metadata keyset query
    val (_, m1) = a.handle("POST", "/collections/docs/query",
      """{"filter":{"n":{"$exists":true}},"limit":3,"after_id":"v03"}""")
    val mp = mapper.readTree(m1)
    assert(mp.get("data").size() == 3)
    assert(!mp.get("pagination").get("has_more").asBoolean(), m1)
  }

  test("percent-encoded ids round-trip through path and query params") {
    val a = api
    val weird = "doc a/b&c#d"
    insert(a, weird, Seq(1, 0, 0))
    val enc = java.net.URLEncoder.encode(weird, "UTF-8")
    val (s1, b1) = a.handle("GET", s"/collections/docs/vectors/$enc", "")
    assert(s1 == 200, b1)
    assert(mapper.readTree(b1).get("id").asText() == weird)
    val (s2, b2) = a.handle("GET",
      s"/collections/docs/vectors?limit=5&after_id=${java.net.URLEncoder.encode("doc", "UTF-8")}", "")
    assert(s2 == 200, b2)
    assert(mapper.readTree(b2).get("vectors").get(0).get("id").asText() == weird)
    val (s3, _) = a.handle("DELETE", s"/collections/docs/vectors/$enc", "")
    assert(s3 == 200)
    val (s4, _) = a.handle("GET", s"/collections/docs/vectors/$enc", "")
    assert(s4 == 404)
  }

  test("ttl honored on a registered parquet-backed table") {
    import org.apache.spark.sql.functions._
    val a = new RestApi(spark)
    a.nowEpochS = () => 1700000000L
    val dir = java.nio.file.Files.createTempDirectory("graft-rest-ttl")
    val path = dir.resolve("t.parquet").toString
    spark.range(10).select(
      concat(lit("r"), col("id")).as("id"),
      array(col("id").cast("float"), lit(0f)).as("vector"),
      // rows 0-4 already expired, 5-9 live forever
      when(col("id") < 5, lit(1699999999L)).as("ttl_expires_at"))
      .write.mode("overwrite").parquet(path)
    a.register("t", spark.read.parquet(path), dims = 2)
    val (_, cnt) = a.handle("POST", "/collections/t/count", "{}")
    assert(mapper.readTree(cnt).get("count").asLong() == 5L)
    val (_, sr) = a.handle("POST", "/collections/t/search",
      """{"vector":[0,0],"k":10,"distance":"euclidean"}""")
    val ids = mapper.readTree(sr).get("results")
    assert((0 until ids.size()).map(i => ids.get(i).get("id").asText())
      .forall(id => id.stripPrefix("r").toInt >= 5), "expired rows excluded")
  }

  test("build_index refuses an oversized collection via the CHEAP " +
      "pre-guard, before any ranking/checkpoint work") {
    val a = api
    (1 to 6).foreach(i => insert(a, s"v$i", Seq(i.toDouble, 0, 0)))
    // 6 live rows > bound 5: the limit(N+1)-count pre-guard fires. Its
    // message ("collection exceeds") is distinct from the post-checkpoint
    // guard's ("<n> rows exceeds"), so this pins WHICH guard refused —
    // the cheap one, before the rank + whole-collection localCheckpoint
    // (the ADVICE r14 resource-amplification fix).
    val e = intercept[IllegalArgumentException] {
      a.buildIndex("docs", """{"num_cells":2}""", maxRows = 5L)
    }
    assert(e.getMessage.contains("collection exceeds the in-process " +
      "serving bound (5)"), e.getMessage)
    // exactly at the bound the same request builds
    val (s, body) = a.buildIndex("docs", """{"num_cells":2}""", maxRows = 6L)
    assert(s == 200, body)
    assert(mapper.readTree(body).get("indexed").asInt() == 6)
  }

  test("ann serving tier: build, full-probe parity with exact search, " +
      "serve-under-writes") {
    val a = api
    (0 until 40).foreach { i =>
      insert(a, s"v$i", Seq(math.sin(i), math.cos(i), math.sin(i * 2)))
    }
    // no index yet → 409 NO_INDEX
    val (no, noBody) = a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"k":5,"mode":"ann"}""")
    assert(no == 409 &&
      mapper.readTree(noBody).get("code").asText() == "NO_INDEX")
    // build
    val (bs, bBody) = a.handle("POST", "/collections/docs/index",
      """{"num_cells":4}""")
    assert(bs == 200, bBody)
    assert(mapper.readTree(bBody).get("indexed").asInt() == 40)
    val (_, st) = a.handle("GET", "/collections/docs/index", "")
    assert(mapper.readTree(st).get("built").asBoolean())
    // full probe == exact search ids, in order
    def ids(body: String): Seq[String] = {
      val rs = mapper.readTree(body).get("results")
      (0 until rs.size()).map(i => rs.get(i).get("id").asText())
    }
    val (_, ex) = a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"k":5}""")
    val (as, ab) = a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"k":5,"mode":"ann","nprobe":4}""")
    assert(as == 200, ab)
    assert(ids(ab) == ids(ex), s"ann=${ids(ab)} exact=${ids(ex)}")
    assert(mapper.readTree(ab).get("mode").asText() == "ann")
    // simd kernel opt-in serves the same ids at full probe
    val (ss, sb) = a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"k":5,"mode":"ann","nprobe":4,"kernel":"simd"}""")
    assert(ss == 200, sb)
    assert(ids(sb).toSet == ids(ex).toSet, s"simd=${ids(sb)} exact=${ids(ex)}")
    // guards: filter and foreign metric are exact-path features
    assert(a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"mode":"ann","filter":{"x":1}}""")._1 == 400)
    assert(a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"mode":"ann","distance":"euclidean"}""")._1 == 400)
    assert(a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"mode":"nope"}""")._1 == 400)
    // serve-under-writes: an insert lands in the live snapshot — a
    // query AT the fresh vector must return it first, no rebuild
    insert(a, "fresh", Seq(0.5, 0.5, 0))
    val (lv, lvBody) = a.handle("POST", "/collections/docs/search",
      """{"vector":[0.5,0.5,0],"k":3,"mode":"ann","nprobe":4}""")
    assert(lv == 200, lvBody)
    assert(ids(lvBody).head == "fresh", s"got ${ids(lvBody)}")
    // replacement: upsert moves the id to the new position
    assert(a.handle("POST", "/collections/docs/vectors/upsert",
      """{"id":"fresh","vector":[-1,0,0]}""")._1 == 200)
    val (_, mv) = a.handle("POST", "/collections/docs/search",
      """{"vector":[-1,0,0],"k":3,"mode":"ann","nprobe":4}""")
    assert(ids(mv).head == "fresh")
    val (_, old) = a.handle("POST", "/collections/docs/search",
      """{"vector":[0.5,0.5,0],"k":3,"mode":"ann","nprobe":4}""")
    assert(ids(old).head != "fresh", "stale position must not serve")
    // delete tombstones out of the snapshot
    assert(a.handle("DELETE", "/collections/docs/vectors/fresh", "")._1 == 200)
    val (_, gone) = a.handle("POST", "/collections/docs/search",
      """{"vector":[-1,0,0],"k":5,"mode":"ann","nprobe":4}""")
    assert(!ids(gone).contains("fresh"))
    // status stays built and tracks the live count
    val st2 = mapper.readTree(
      a.handle("GET", "/collections/docs/index", "")._2)
    assert(st2.get("built").asBoolean && st2.get("rows").asLong == 40L)
    // a TTL insert has no expiry clock in the snapshot → invalidates
    assert(a.handle("POST", "/collections/docs/vectors",
      """{"id":"ttl1","vector":[0,0,1],"ttl_seconds":60}""")._1 == 200)
    val (inv, invBody) = a.handle("POST", "/collections/docs/search",
      """{"vector":[1,0,0],"k":5,"mode":"ann"}""")
    assert(inv == 409 &&
      mapper.readTree(invBody).get("code").asText() == "NO_INDEX")
    // drop route idempotent
    assert(a.handle("DELETE", "/collections/docs/index", "")._1 == 200)
  }

  test("live HTTP round-trip through the JDK host") {
    val a = api
    insert(a, "v1", Seq(1, 0, 0))
    val server = a.serve(0)
    try {
      val port = server.getAddress.getPort
      val client = java.net.http.HttpClient.newHttpClient()
      def call(method: String, path: String, body: String) = {
        val b = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$path"))
        val req = (if (method == "GET") b.GET()
                   else b.method(method, java.net.http.HttpRequest
                     .BodyPublishers.ofString(body))).build()
        client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      val health = call("GET", "/health", "")
      assert(health.statusCode() == 200 &&
        mapper.readTree(health.body()).get("status").asText() == "ok")
      val sr = call("POST", "/collections/docs/search",
        """{"vector":[1,0,0],"k":1}""")
      assert(sr.statusCode() == 200)
      assert(mapper.readTree(sr.body()).get("results").get(0)
        .get("id").asText() == "v1")
      assert(call("GET", "/collections/missing", "").statusCode() == 404)
    } finally server.stop(0)
  }
}
