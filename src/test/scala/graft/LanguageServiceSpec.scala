package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.needleql._
import graft.needleql.LanguageService._

/** Editor services over the NeedleQL grammar: positioned diagnostics,
  * catalog-aware completions and hover, and the JSON-RPC LSP framing.
  */
class LanguageServiceSpec extends SparkSpec {
  import spark.implicits._

  private def session(): NeedleSession = {
    val s = new NeedleSession(spark)
    s.register("docs", CollectionDef(
      Seq(("a", Array(1f, 0f), "news", 3.0))
        .toDF("id", "vector", "category", "score")))
    s.createAlias("d", "docs")
    s
  }

  test("diagnostics position parse errors at the offending token") {
    // parser stops at the dangling WHERE's missing predicate (EOF)
    val d1 = diagnostics("SELECT * FROM docs WHERE").head
    assert(d1.severity == 1)
    assert(d1.start == Position(0, 24))
    // a bad token mid-line carries its own line/column
    val text = "SELECT *\nFROM docs\nWHERE category == 'x'"
    val d2 = diagnostics(text).head
    assert(d2.start.line == 2, d2)
    // lex errors carry the lexer's own offset
    val d3 = diagnostics("SELECT * FROM docs WHERE a = 'oops").head
    assert(d3.message.contains("Unterminated"))
    // clean statements produce no diagnostics; blank text neither
    assert(diagnostics("SELECT * FROM docs LIMIT 5").isEmpty)
    assert(diagnostics("  \n").isEmpty)
  }

  test("diagnostics flag unknown collections against the live catalog") {
    val s = session()
    val ds = diagnostics("SELECT * FROM ghost LIMIT 1", Some(s))
    assert(ds.map(_.message) == Seq("Unknown collection: ghost"))
    assert(ds.head.start == Position(0, 14))
    assert(diagnostics("SELECT * FROM docs", Some(s)).isEmpty)
    // aliases resolve
    assert(diagnostics("SELECT * FROM d", Some(s)).isEmpty)
  }

  test("completions: collections after FROM, columns inside WHERE, " +
      "keywords elsewhere, prefix-filtered") {
    val s = session()
    val afterFrom = completions("SELECT * FROM ", 14, Some(s))
    assert(afterFrom.map(_.label).toSet == Set("docs", "d"))
    assert(afterFrom.find(_.label == "docs").get.detail
      .contains("4 columns"))
    // typing a partial collection name filters
    val partial = completions("SELECT * FROM do", 16, Some(s))
    assert(partial.map(_.label) == Seq("docs"))
    // inside WHERE of a known collection: its columns come first
    val inWhere = completions("SELECT * FROM docs WHERE ", 25, Some(s))
    assert(inWhere.take(4).map(_.label) ==
      Seq("id", "vector", "category", "score"))
    assert(inWhere.exists(c => c.label == "AND" && c.kind == "keyword"))
    // keyword prefix at the start of a statement
    val kw = completions("SEL", 3, None)
    assert(kw.map(_.label) == Seq("SELECT"))
  }

  test("hover: keyword docs, collection summaries, column types") {
    val s = session()
    val text = "SELECT * FROM docs WHERE category = 'news'"
    assert(hover(text, 0).exists(_.contains("projection query")))
    assert(hover(text, text.indexOf("docs"), Some(s))
      .exists(_.contains("metric cosine")))
    assert(hover(text, text.indexOf("category"), Some(s))
      .contains("category: column of docs (string)"))
    assert(hover(text, text.indexOf("'news'"), Some(s)).isEmpty)
  }

  test("LSP framing: initialize, didOpen diagnostics, completion, hover") {
    val mapper = new ObjectMapper()
    val lsp = new LspServer(Some(session()))
    val (initResp, _) = lsp.handle(
      """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}""")
    val caps = mapper.readTree(initResp.get).get("result").get("capabilities")
    assert(caps.get("hoverProvider").asBoolean())

    val (_, notes) = lsp.handle(
      """{"jsonrpc":"2.0","method":"textDocument/didOpen","params":
        |{"textDocument":{"uri":"q.nql","text":"SELECT * FROM ghost"}}}"""
        .stripMargin.replace("\n", ""))
    val diag = mapper.readTree(notes.head)
    assert(diag.get("method").asText() == "textDocument/publishDiagnostics")
    val d0 = diag.get("params").get("diagnostics").get(0)
    assert(d0.get("message").asText() == "Unknown collection: ghost")
    assert(d0.get("range").get("start").get("character").asInt() == 14)

    // didChange to a clean doc clears diagnostics
    val (_, notes2) = lsp.handle(
      """{"jsonrpc":"2.0","method":"textDocument/didChange","params":
        |{"textDocument":{"uri":"q.nql"},"contentChanges":
        |[{"text":"SELECT * FROM docs WHERE "}]}}"""
        .stripMargin.replace("\n", ""))
    assert(mapper.readTree(notes2.head).get("params").get("diagnostics")
      .size() == 1) // dangling WHERE is a parse error

    val (compResp, _) = lsp.handle(
      """{"jsonrpc":"2.0","id":2,"method":"textDocument/completion","params":
        |{"textDocument":{"uri":"q.nql"},"position":{"line":0,"character":25}}}"""
        .stripMargin.replace("\n", ""))
    val labels = mapper.readTree(compResp.get).get("result").elements()
    val first = labels.next()
    assert(first.get("label").asText() == "id" &&
      first.get("kind").asInt() == 5)

    val (hoverResp, _) = lsp.handle(
      """{"jsonrpc":"2.0","id":3,"method":"textDocument/hover","params":
        |{"textDocument":{"uri":"q.nql"},"position":{"line":0,"character":14}}}"""
        .stripMargin.replace("\n", ""))
    assert(mapper.readTree(hoverResp.get).get("result").get("contents")
      .get("value").asText().contains("metric cosine"))

    val (shutResp, _) = lsp.handle(
      """{"jsonrpc":"2.0","id":4,"method":"shutdown"}""")
    assert(shutResp.isDefined)
  }

  test("offset/position conversion round-trips across lines") {
    val text = "line one\nline two\nline three"
    assert(positionAt(text, 0) == Position(0, 0))
    assert(positionAt(text, 9) == Position(1, 0))
    assert(positionAt(text, 14) == Position(1, 5))
    assert(positionAt(text, 1000) == Position(2, 10)) // clamped to end
  }
}
