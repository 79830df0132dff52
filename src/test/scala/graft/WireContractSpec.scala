package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper, SerializationFeature}

import graft.server.RestApi

/** Wire-contract fixture + Go SDK structural parity.
  *
  * The Go SDK (`sdk/go`) cannot run in this sandbox (no Go toolchain), so
  * its contract is pinned structurally instead: a deterministic scripted
  * session drives the real `RestApi` through every route the SDK calls,
  * and the (method, path, request, status, response) goldens are committed
  * as `sdk/go/wire_contract.json`. Three contracts hold:
  *
  *   1. the server still produces exactly the committed goldens
  *      (regenerate deliberately with GRAFT_WIRE_REGEN=1);
  *   2. the SDK's route table — every `c.do(ctx, http.MethodX, path)` in
  *      the Go source, extracted textually — equals the set of route
  *      templates the fixture exercises, both directions;
  *   3. every JSON field the SDK knows (struct `json:"..."` tags and
  *      request-map keys in the Go source) appears somewhere in the
  *      fixture's requests or responses — so a renamed server field breaks
  *      this spec instead of silently decoding to a zero value in Go.
  *
  * A Go toolchain would still be needed to PROVE the client end-to-end;
  * this pins the wire surface it is written against.
  */
class WireContractSpec extends SparkSpec {

  private val goDir = Paths.get("sdk/go")
  private val fixturePath = goDir.resolve("wire_contract.json")

  private val mapper = new ObjectMapper()
    .configure(SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)

  /** Canonical JSON: parsed, maps sorted by key, re-serialized. */
  private def canon(json: String): JsonNode =
    if (json == null || json.isEmpty) mapper.createObjectNode()
    else mapper.readTree(mapper.writeValueAsString(
      mapper.treeToValue(mapper.readTree(json), classOf[Object])))

  private case class Interaction(name: String, template: String,
                                 method: String, path: String, request: String)

  /** The scripted session: every SDK route, every typed field exercised.
    * Deterministic by construction — fixed vectors, fixed ids, fixed
    * parameters; the one clock input (ttl_seconds) is far-future so
    * liveness never flips across runs.
    */
  private val session: Seq[Interaction] = {
    def i(name: String, template: String, method: String, path: String,
          request: String = ""): Interaction =
      Interaction(name, template, method, path, request)
    Seq(
      i("health", "/health", "GET", "/health"),
      i("create_collection", "/collections", "POST", "/collections",
        """{"name":"wire","dimensions":4,"distance":"cosine"}"""),
      i("create_conflict", "/collections", "POST", "/collections",
        """{"name":"wire","dimensions":4}"""),
      i("list_collections", "/collections", "GET",
        "/collections?offset=0&limit=10"),
      i("get_missing_collection", "/collections/{}", "GET",
        "/collections/nope"),
      i("insert", "/collections/{}/vectors", "POST",
        "/collections/wire/vectors",
        """{"id":"v1","vector":[1.0,0.0,0.0,0.0],"metadata":{"lang":"en","source":"a"}}"""),
      i("insert_duplicate", "/collections/{}/vectors", "POST",
        "/collections/wire/vectors",
        """{"id":"v1","vector":[1.0,0.0,0.0,0.0]}"""),
      i("insert_ttl", "/collections/{}/vectors", "POST",
        "/collections/wire/vectors",
        """{"id":"v2","vector":[0.0,1.0,0.0,0.0],"metadata":{"lang":"de","source":"a"},"ttl_seconds":8888888888}"""),
      i("insert_batch", "/collections/{}/vectors/batch", "POST",
        "/collections/wire/vectors/batch",
        """{"vectors":[{"id":"v3","vector":[0.0,0.0,1.0,0.0],"metadata":{"lang":"en","source":"b"}},{"id":"v4","vector":[0.5,0.5,0.0,0.0],"metadata":{"lang":"fr","source":"b"}}]}"""),
      i("upsert", "/collections/{}/vectors/upsert", "POST",
        "/collections/wire/vectors/upsert",
        """{"id":"v1","vector":[0.75,0.25,0.0,0.0],"metadata":{"lang":"en","source":"a2"}}"""),
      i("upsert_batch", "/collections/{}/vectors/upsert-batch", "POST",
        "/collections/wire/vectors/upsert-batch",
        """{"vectors":[{"id":"v4","vector":[0.5,0.5,0.25,0.0]},{"id":"v5","vector":[0.0,0.5,0.5,0.0]}]}"""),
      i("get_vector", "/collections/{}/vectors/{}", "GET",
        "/collections/wire/vectors/v1"),
      i("get_vector_missing", "/collections/{}/vectors/{}", "GET",
        "/collections/wire/vectors/v999"),
      i("list_vectors_page1", "/collections/{}/vectors", "GET",
        "/collections/wire/vectors?limit=2"),
      i("list_vectors_page2", "/collections/{}/vectors", "GET",
        "/collections/wire/vectors?limit=2&after_id=v2"),
      i("get_collection", "/collections/{}", "GET", "/collections/wire"),
      i("search_exact", "/collections/{}/search", "POST",
        "/collections/wire/search",
        """{"vector":[1.0,0.0,0.0,0.0],"k":3}"""),
      i("search_filtered", "/collections/{}/search", "POST",
        "/collections/wire/search",
        """{"vector":[1.0,0.0,0.0,0.0],"k":2,"distance":"euclidean","filter":{"source":"b"},"post_filter":{"lang":{"$ne":"de"}},"post_filter_factor":2,"include_vectors":true}"""),
      i("search_cursor", "/collections/{}/search", "POST",
        "/collections/wire/search",
        """{"vector":[1.0,0.0,0.0,0.0],"k":2,"search_after":{"distance":0.0,"id":"v1"}}"""),
      i("search_batch", "/collections/{}/search/batch", "POST",
        "/collections/wire/search/batch",
        """{"vectors":[[1.0,0.0,0.0,0.0],[0.0,0.0,1.0,0.0]],"k":2,"filter":{"lang":{"$in":["en","fr"]}}}"""),
      i("search_radius", "/collections/{}/search/radius", "POST",
        "/collections/wire/search/radius",
        """{"vector":[1.0,0.0,0.0,0.0],"max_distance":0.5,"limit":10}"""),
      i("recommend", "/collections/{}/recommend", "POST",
        "/collections/wire/recommend",
        """{"positive_ids":["v1"],"negative_ids":["v3"],"limit":2}"""),
      i("count_filtered", "/collections/{}/count", "POST",
        "/collections/wire/count", """{"filter":{"lang":"en"}}"""),
      i("metadata_query", "/collections/{}/query", "POST",
        "/collections/wire/query",
        """{"filter":{"source":{"$exists":true}},"limit":2,"offset":0}"""),
      i("metadata_query_keyset", "/collections/{}/query", "POST",
        "/collections/wire/query",
        """{"filter":{"source":{"$exists":true}},"limit":2,"after_id":"v1"}"""),
      i("build_index", "/collections/{}/index", "POST",
        "/collections/wire/index", """{"num_cells":1,"nprobe":1}"""),
      i("index_status", "/collections/{}/index", "GET",
        "/collections/wire/index"),
      i("search_ann", "/collections/{}/search", "POST",
        "/collections/wire/search",
        """{"vector":[1.0,0.0,0.0,0.0],"k":2,"mode":"ann","nprobe":1,"kernel":"simd"}"""),
      i("drop_index", "/collections/{}/index", "DELETE",
        "/collections/wire/index"),
      i("search_ann_no_index", "/collections/{}/search", "POST",
        "/collections/wire/search",
        """{"vector":[1.0,0.0,0.0,0.0],"k":2,"mode":"ann"}"""),
      i("delete_vector", "/collections/{}/vectors/{}", "DELETE",
        "/collections/wire/vectors/v5"),
      i("delete_batch", "/collections/{}/vectors/delete-batch", "POST",
        "/collections/wire/vectors/delete-batch",
        """{"ids":["v3","v999"]}"""),
      i("rename_collection", "/collections/{}/rename", "POST",
        "/collections/wire/rename", """{"new_name":"wire2"}"""),
      i("delete_collection", "/collections/{}", "DELETE",
        "/collections/wire2"))
  }

  private def runSession(): JsonNode = {
    val api = new RestApi(spark)
    val out = mapper.createArrayNode()
    session.foreach { s =>
      val (status, resp) = api.handle(s.method, s.path, s.request)
      val e = out.addObject()
      e.put("name", s.name).put("template", s.template)
      e.put("method", s.method).put("path", s.path)
      e.set[JsonNode]("request", canon(s.request))
      e.put("status", status)
      e.set[JsonNode]("response", canon(resp))
    }
    canon(mapper.writeValueAsString(
      mapper.createObjectNode().set[JsonNode]("interactions", out)))
  }

  test("server behavior matches the committed wire-contract fixture") {
    val got = runSession()
    val pretty = mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(got) + "\n"
    if (sys.env.contains("GRAFT_WIRE_REGEN")) {
      Files.write(fixturePath, pretty.getBytes(StandardCharsets.UTF_8))
      info(s"regenerated $fixturePath")
    } else {
      assert(Files.exists(fixturePath),
        s"missing $fixturePath — run with GRAFT_WIRE_REGEN=1 to generate")
      val want = mapper.readTree(Files.readString(fixturePath))
      val wi = want.get("interactions")
      val gi = got.get("interactions")
      assert(wi.size() == gi.size(),
        s"fixture has ${wi.size()} interactions, session produced ${gi.size()}")
      (0 until gi.size()).foreach { ix =>
        assert(wi.get(ix) == gi.get(ix),
          s"interaction '${gi.get(ix).get("name").asText()}' diverged:\n" +
            s"  fixture: ${wi.get(ix)}\n  session: ${gi.get(ix)}")
      }
    }
  }

  // ------------------------------------------------------ Go source lints

  private lazy val goSource: Map[String, String] =
    Files.list(goDir).iterator().asScala
      // _test.go files exercise the client with sample data; the SDK's
      // contract surface is the non-test sources
      .filter(p => p.toString.endsWith(".go") &&
        !p.toString.endsWith("_test.go"))
      .map(p => p.getFileName.toString -> Files.readString(p)).toMap

  /** Normalize a Go path expression (a `+`-concat of string literals,
    * pathEscape(x) calls, and numeric idents) to a route template with
    * `{}` placeholders, cut at the query string.
    */
  private def normalizeGoPath(expr: String): String = {
    val joined = expr.split('+').map(_.trim).map {
      case s if s.startsWith("\"") && s.endsWith("\"") =>
        s.substring(1, s.length - 1)
      case s if s.startsWith("pathEscape(") => "{}"
      case _ => "" // strconv.Itoa(limit) etc — query-string only
    }.mkString
    joined.takeWhile(c => c != '?' && c != '&')
  }

  /** Every (method, route template) the Go SDK dials, extracted from the
    * `c.do(ctx, http.MethodX, <pathExpr>, ...)` calls. A path passed as a
    * local variable resolves through its `name := expr` / `name += expr`
    * assignments in the same file.
    */
  private lazy val goRoutes: Set[(String, String)] = {
    val doCall = """(?s)c\.do\(ctx,\s*http\.Method(\w+),\s*(.*?),\s*\n?\s*(?:nil|body|opts|v|map\[string\]any\{[^}]*\}|&?\w+)\s*,""".r
    goSource.toSeq.flatMap { case (_, src) =>
      doCall.findAllMatchIn(src).map { m =>
        val method = m.group(1).toUpperCase(java.util.Locale.ROOT)
        val raw = m.group(2).trim
        val pathExpr =
          if (raw.matches("[a-zA-Z_]\\w*")) {
            // variable: stitch together its := and += assignments
            val assigns = (raw + """\s*(?::=|\+=)\s*(.+)""").r
            assigns.findAllMatchIn(src).map(_.group(1).trim.stripSuffix(","))
              .mkString("+")
          } else raw
        (method match {
          case "GET" => "GET"; case "POST" => "POST"
          case "DELETE" => "DELETE"; case "PUT" => "PUT"; case other => other
        }) -> normalizeGoPath(pathExpr)
      }
    }.toSet
  }

  test("Go SDK route table equals the fixture's exercised routes, " +
      "both directions") {
    val fixtureRoutes = session.map(s => s.method -> s.template).toSet
    val sdkOnly = goRoutes -- fixtureRoutes
    val fixtureOnly = fixtureRoutes -- goRoutes
    assert(sdkOnly.isEmpty,
      s"SDK dials routes the fixture never exercises: $sdkOnly")
    assert(fixtureOnly.isEmpty,
      s"fixture exercises routes the SDK cannot dial: $fixtureOnly")
  }

  /** Keys of a JSON tree, not descending into the dynamic-map subtrees
    * (metadata contents, filter expressions) whose keys are user data,
    * not wire contract.
    */
  private def wireKeys(node: JsonNode): Set[String] = {
    val dynamic = Set("metadata", "filter", "post_filter", "search_after")
    def walk(n: JsonNode): Set[String] =
      if (n.isObject)
        n.properties().asScala.flatMap { e =>
          Set(e.getKey) ++ (if (dynamic(e.getKey)) Set.empty[String]
                            else walk(e.getValue))
        }.toSet
      else if (n.isArray) n.asScala.flatMap(walk).toSet
      else Set.empty
    walk(node)
  }

  test("every JSON field the Go SDK knows appears in the fixture") {
    val tag = """json:"(\w+)""".r
    val mapKey = """"(\w+)":\s""".r
    val bodyKey = """body\["(\w+)"\]""".r
    val goFields = goSource.values.flatMap { src =>
      tag.findAllMatchIn(src).map(_.group(1)) ++
        bodyKey.findAllMatchIn(src).map(_.group(1)) ++
        // keys of inline request maps: map[string]any{"vectors": vs}
        """map\[string\]any\{([^}]*)\}""".r.findAllMatchIn(src)
          .flatMap(m => mapKey.findAllMatchIn(m.group(1)).map(_.group(1)))
    }.toSet
    val exercised = runSession().get("interactions").asScala.flatMap { e =>
      wireKeys(e.get("request")) ++ wireKeys(e.get("response"))
    }.toSet
    val unexercised = goFields -- exercised
    assert(unexercised.isEmpty,
      s"Go SDK fields never seen on the wire in the fixture session: " +
        s"$unexercised — extend the session or fix the SDK field")
  }
}
