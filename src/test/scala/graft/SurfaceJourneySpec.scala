package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.server.{GraphqlApi, LlmTools, McpServer, RestApi, WebUi}

/** Cross-surface integration journey: ONE RestApi registry driven and
  * observed through every host surface a switching reference user
  * would touch — MCP creates, GraphQL mutates and reads, REST counts,
  * the web dashboard renders, the LLM function tools inspect and
  * delete — asserting after each step that every OTHER surface sees
  * the same state. Pins the "all front ends share one validation and
  * serving path" architecture claim as behavior, not prose.
  */
class SurfaceJourneySpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  test("create via MCP, write via GraphQL, observe via REST + WebUi + " +
      "LLM tools, delete via GraphQL — every surface agrees at each step") {
    val api = new RestApi(spark)
    val gql = new GraphqlApi(api)
    val ui = new WebUi(api, now = () => 1700000000L)
    val mcp = new McpServer(api)
    mcp.nowEpochMs = () => 1700000000000L
    val llm = new LlmTools(api, embedDims = 4)

    def mcpCall(tool: String, args: String) = {
      val resp = mapper.readTree(mcp.handle(
        s"""{"jsonrpc":"2.0","id":1,"method":"tools/call",
           |"params":{"name":"$tool","arguments":$args}}""".stripMargin))
      val result = resp.get("result")
      assert(result != null && !Option(result.get("isError"))
        .exists(_.asBoolean(false)), resp.toString)
      mapper.readTree(result.get("content").get(0).get("text").asText())
    }
    def gqlRun(doc: String) = {
      val (st, resp) = gql.handle(mapper.writeValueAsString(
        mapper.createObjectNode().put("query", doc)))
      val r = mapper.readTree(resp)
      assert(st == 200 && r.get("errors") == null, resp)
      r.get("data")
    }

    // 1. MCP creates the collection
    mcpCall("create_collection", """{"name":"journey","dimensions":4}""")

    // ... GraphQL + REST + WebUi all see it immediately
    assert(gqlRun("{ collections { name vectorCount } }")
      .get("collections").get(0).get("name").asText() == "journey")
    val (rs, restList) = api.handle("GET", "/collections", "")
    assert(rs == 200 &&
      mapper.readTree(restList).get("collections").get(0)
        .get("name").asText() == "journey")
    val (us, _, uiStats) = ui.handle("GET", "/api/stats")
    assert(us == 200 &&
      mapper.readTree(uiStats).get("total_collections").asInt() == 1)

    // 2. GraphQL writes: one insert + a two-row batch
    gqlRun("""mutation { insertVector(input: {collection: "journey", id: "g1", vector: [1.0, 0.0, 0.0, 0.0], metadata: "{\"via\": \"graphql\"}"}) { id } }""")
    gqlRun("""mutation { batchInsert(collection: "journey", inputs: [{collection: "journey", id: "g2", vector: [0.0, 1.0, 0.0, 0.0]}, {collection: "journey", id: "g3", vector: [0.0, 0.0, 1.0, 0.0]}]) }""")

    // ... REST count, MCP info, LLM tools info, WebUi page all say 3
    assert(mapper.readTree(api.handle("GET", "/collections/journey", "")._2)
      .get("count").asLong() == 3L)
    assert(mcpCall("collection_info", """{"name":"journey"}""")
      .get("vector_count").asLong() == 3L)
    val info = llm.execute("needle_collection_info",
      """{"collection":"journey"}""")
    assert(info.success &&
      mapper.readTree(info.result).get("count").asLong() == 3L)
    val (ps, _, page) = ui.handle("GET", "/collections/journey")
    assert(ps == 200 && page.contains("journey") && page.contains("3"))

    // 3. MCP searches and finds the GraphQL-written vector at distance 0
    val hits = mcpCall("search",
      """{"collection":"journey","vector":[1.0,0.0,0.0,0.0],"k":1}""")
    assert(hits.get("results").get(0).get("id").asText() == "g1")
    assert(hits.get("results").get(0).get("distance").asDouble() == 0.0)

    // 4. MCP writes one more; GraphQL search sees it immediately
    mcpCall("insert_vectors",
      """{"collection":"journey","vectors":[{"id":"m1","values":[0.0,0.0,0.0,1.0]}]}""")
    val s = gqlRun("""{ search(input: {collection: "journey", vector: [0.0, 0.0, 0.0, 1.0], k: 1}) { results { id distance } } }""")
    assert(s.get("search").get("results").get(0).get("id").asText() == "m1")
    assert(gqlRun("{ health { totalVectors } }")
      .get("health").get("totalVectors").asLong() == 4L)

    // 5. LLM tool deletes one; every surface decrements
    assert(llm.execute("needle_delete",
      """{"collection":"journey","id":"g2"}""").success)
    assert(mcpCall("collection_info", """{"name":"journey"}""")
      .get("vector_count").asLong() == 3L)
    assert(gqlRun("{ collection(name: \"journey\") { vectorCount } }")
      .get("collection").get("vectorCount").asLong() == 3L)

    // 6. GraphQL drops the collection; MCP and the dashboard agree
    assert(gqlRun("""mutation { deleteCollection(name: "journey") }""")
      .get("deleteCollection").asBoolean())
    assert(mcpCall("list_collections", "{}").get("collections").size() == 0)
    assert(mapper.readTree(ui.handle("GET", "/api/stats")._3)
      .get("total_collections").asInt() == 0)
  }
}
