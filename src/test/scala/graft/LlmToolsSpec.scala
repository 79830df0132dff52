package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.server.{LlmTools, RestApi}

/** LLM function-calling surface vs llm_tools.rs: the six tool schemas in
  * OpenAI format, the reference's validation checks, and live execution
  * against the REST surface (where the reference mocks).
  */
class LlmToolsSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def tools() = new LlmTools(new RestApi(spark), embedDims = 16)

  test("registry carries the six reference tools in OpenAI format") {
    val t = tools()
    assert(t.size == 6)
    val arr = mapper.readTree(t.toOpenAiTools)
    assert(arr.size() == 6)
    val first = arr.get(0)
    assert(first.get("type").asText() == "function")
    assert(first.get("function").get("name").asText() ==
      "needle_create_collection")
    val search = t.get("needle_search").get.get("function")
    assert(search.get("description").asText() ==
      "Search for similar documents by text query")
    assert(search.get("parameters").get("required").get(1).asText() ==
      "query")
    assert(search.get("parameters").get("properties").get("k")
      .get("default").asInt() == 5)
  }

  test("validateCall: unknown function, then required fields — nothing " +
      "deeper (reference semantics)") {
    val t = tools()
    assert(t.validateCall("nope", "{}") == Left("Unknown function: nope"))
    assert(t.validateCall("needle_insert",
      """{"collection":"c","id":"x"}""") ==
      Left("Missing required field: text"))
    // wrong TYPES pass validation — the reference only checks presence
    assert(t.validateCall("needle_create_collection",
      """{"name":"c","dimensions":"not-a-number"}""").isRight)
    assert(t.validateCall("needle_list_collections", "{}").isRight)
  }

  test("execute dispatches the full tool loop against the live REST " +
      "surface") {
    val t = tools()
    val created = t.execute("needle_create_collection",
      """{"name":"notes","dimensions":16}""")
    assert(created.success, created.error)
    val ins = t.execute("needle_insert",
      """{"collection":"notes","id":"n1",
        |"text":"spark powers the engine","metadata":{"lang":"en"}}"""
        .stripMargin.replace("\n", ""))
    assert(ins.success, ins.error)
    t.execute("needle_insert",
      """{"collection":"notes","id":"n2","text":"unrelated prose"}""")
    // exact text query → n1 at distance 0, metadata carried through
    val hits = t.execute("needle_search",
      """{"collection":"notes","query":"spark powers the engine","k":1}""")
    assert(hits.success)
    val r0 = mapper.readTree(hits.result).get("results").get(0)
    assert(r0.get("id").asText() == "n1")
    assert(r0.get("distance").asDouble() < 1e-9)
    assert(r0.get("metadata").get("lang").asText() == "en")
    assert(r0.get("metadata").get("_text").asText() ==
      "spark powers the engine")
    val info = t.execute("needle_collection_info",
      """{"collection":"notes"}""")
    assert(mapper.readTree(info.result).get("count").asLong() == 2)
    assert(t.execute("needle_delete",
      """{"collection":"notes","id":"n2"}""").success)
    val listed = t.execute("needle_list_collections", "{}")
    val c0 = mapper.readTree(listed.result).get("collections").get(0)
    assert(c0.get("name").asText() == "notes" &&
      c0.get("count").asLong() == 1)
    // API-level failures surface as unsuccessful results, not throws
    val dup = t.execute("needle_create_collection",
      """{"name":"notes","dimensions":16}""")
    assert(!dup.success && dup.error.exists(_.contains("already exists")))
    val missing = t.execute("needle_collection_info",
      """{"collection":"ghost"}""")
    assert(!missing.success)
  }
}
