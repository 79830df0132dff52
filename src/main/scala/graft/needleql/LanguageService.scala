package graft.needleql

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** NeedleQL language service — the editor-facing analogue of the
  * reference's LSP integration (src/services/client/vscode_extension.rs
  * declares the protocol; the query grammar it serves is
  * src/search/query_lang/parser.rs). Pure functions over the engine's own
  * lexer/parser — no I/O, no Spark jobs: diagnostics re-lex with offsets
  * and surface the parser's stop position as an (line, character) range;
  * completions and hover are token-context lookups against the grammar's
  * keyword table and the live [[NeedleSession]] catalog (collection
  * names, their column names from the registered DataFrame schemas — the
  * session already holds those schemas, so no query runs).
  *
  * [[LspServer]] frames the same functions as JSON-RPC 2.0 LSP methods
  * (initialize / didOpen / didChange / completion / hover), so any LSP
  * client can mount the service over stdio.
  */
object LanguageService {

  final case class Position(line: Int, character: Int)
  final case class Diagnostic(start: Position, end: Position,
                              message: String, severity: Int)
  final case class Completion(label: String, kind: String,
                              detail: String = "")

  /** Grammar keyword table (Parser scaladoc grammar): completion + hover
    * docs in one place.
    */
  val keywords: Map[String, String] = Map(
    "SELECT" -> "SELECT (*|cols) FROM collection — projection query",
    "SEARCH" -> "SEARCH NEAR $param FROM collection — similarity sugar",
    "NEAR" -> "SEARCH NEAR $param — bind the query vector parameter",
    "FROM" -> "FROM collection — the registered collection to read",
    "WHERE" -> "WHERE expr — metadata predicate (AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL)",
    "NEAREST_TO" -> "NEAREST_TO(vector[, metric][, k]) — similarity clause",
    "SIMILAR" -> "col SIMILAR TO $param — per-column similarity predicate",
    "TO" -> "SIMILAR TO $param", "AS" -> "AS OF version|timestamp — time travel",
    "OF" -> "AS OF version|timestamp",
    "WITH" -> "WITH TIME_DECAY(col[, opt = v]*) — recency weighting",
    "TIME_DECAY" -> "TIME_DECAY(col[, half_life = 7d][, decay_rate = n])",
    "USING" -> "USING RAG(opt = v, ...) — retrieval-augmented options",
    "RAG" -> "USING RAG(...)",
    "RERANK" -> "RERANK BY strategy — post-retrieval reordering",
    "BY" -> "RERANK BY / ORDER BY",
    "ORDER" -> "ORDER BY col [ASC|DESC][, ...]",
    "LIMIT" -> "LIMIT n — result cap", "OFFSET" -> "OFFSET n — skip n rows",
    "AND" -> "logical AND", "OR" -> "logical OR", "NOT" -> "negation",
    "IN" -> "col [NOT] IN (v, ...)",
    "BETWEEN" -> "col [NOT] BETWEEN lo AND hi",
    "LIKE" -> "col [NOT] LIKE 'pattern%'",
    "IS" -> "col IS [NOT] NULL", "NULL" -> "null literal / IS NULL",
    "EXPLAIN" -> "EXPLAIN [ANALYZE] query — plan without executing",
    "ANALYZE" -> "EXPLAIN ANALYZE — plan with metrics",
    "INSERT" -> "INSERT INTO collection ...",
    "DELETE" -> "DELETE FROM collection WHERE ...",
    "CREATE" -> "CREATE [MATERIALIZED] VIEW name AS query | CREATE COLLECTION name [WITH (...)]",
    "VIEW" -> "CREATE VIEW name AS query",
    "MATERIALIZED" -> "CREATE MATERIALIZED VIEW — computed at creation",
    "COLLECTION" -> "CREATE/DROP COLLECTION name",
    "DROP" -> "DROP VIEW name | DROP COLLECTION name",
    "SHOW" -> "SHOW COLLECTIONS — list the catalog",
    "COLLECTIONS" -> "SHOW COLLECTIONS")

  /** 0-based character offset → (line, character), both 0-based. */
  def positionAt(text: String, offset: Int): Position = {
    val off = math.max(0, math.min(offset, text.length))
    val before = text.substring(0, off)
    val line = before.count(_ == '\n')
    val lastNl = before.lastIndexOf('\n')
    Position(line, off - lastNl - 1)
  }

  /** Length of the token starting at `offset` (for the diagnostic range's
    * end); at least 1 so empty-at-EOF ranges stay visible.
    */
  private def tokenLengthAt(text: String, offset: Int): Int = {
    if (offset >= text.length) return 1
    val c = text.charAt(offset)
    if (c.isLetterOrDigit || c == '_') {
      var j = offset
      while (j < text.length && (text.charAt(j).isLetterOrDigit ||
        text.charAt(j) == '_' || text.charAt(j) == '.')) j += 1
      j - offset
    } else 1
  }

  /** Parse + (when a session is given) catalog-check one document.
    * Severity 1 = error (parse/lex, unknown collection), 2 = warning.
    */
  def diagnostics(text: String,
                  session: Option[NeedleSession] = None): Seq[Diagnostic] = {
    if (text.isBlank) return Nil
    Parser.parseWithPos(text) match {
      case Left((msg, off)) =>
        val start = positionAt(text, off)
        val end = positionAt(text, off + tokenLengthAt(text, off))
        Seq(Diagnostic(start, end, msg, severity = 1))
      case Right(stmt) =>
        session.toSeq.flatMap { s =>
          referencedCollections(stmt).flatMap { name =>
            if (s.collections.contains(name) || s.aliases.contains(name)) Nil
            else {
              val off = math.max(0, text.indexOf(name))
              Seq(Diagnostic(positionAt(text, off),
                positionAt(text, off + name.length),
                s"Unknown collection: $name", severity = 1))
            }
          }
        }
    }
  }

  /** Collection names a statement reads or writes (for catalog checks). */
  def referencedCollections(stmt: Ast.Statement): Seq[String] = stmt match {
    case Ast.SelectStmt(q) => Seq(q.from)
    case Ast.ExplainStmt(q, _) => Seq(q.from)
    case Ast.InsertStmt(c, _, _, _) => Seq(c)
    case Ast.DeleteStmt(c, _) => Seq(c)
    case Ast.CreateViewStmt(_, _, q) => Seq(q.from)
    case _ => Nil
  }

  /** Completions at a cursor offset: after FROM/INTO → collection names
    * (and aliases); inside a WHERE of a known collection → its column
    * names, then keywords; otherwise keywords. Purely token-context —
    * no execution.
    */
  def completions(text: String, offset: Int,
                  session: Option[NeedleSession] = None): Seq[Completion] = {
    val prefix = text.substring(0, math.max(0, math.min(offset, text.length)))
    val toks =
      try Lexer.tokenizeWithOffsets(prefix).dropRight(1) // drop TEof
      catch { case _: Lexer.LexError => return Nil }
    def kwAt(i: Int): Option[String] = toks.lift(i).map(_._1).collect {
      case Lexer.TIdent(s) => s.toUpperCase(java.util.Locale.ROOT)
    }
    // the token being typed (cursor touching its end) is context, not
    // the anchor — look left of it when it is a partial word
    val typingPartial = toks.nonEmpty &&
      toks.last._2 + tokenAt(prefix, toks.last._2).length == prefix.length &&
      !prefix.endsWith(" ")
    val anchorIdx = if (typingPartial) toks.length - 2 else toks.length - 1
    val anchor = kwAt(anchorIdx)
    val partial = if (typingPartial) tokenAt(prefix, toks.last._2)
                  else ""
    val items: Seq[Completion] = anchor match {
      case Some("FROM") | Some("INTO") =>
        session.toSeq.flatMap(s =>
          s.collections.keys.map(n =>
            Completion(n, "collection", collectionDetail(s, n))) ++
            s.listAliases.map { case (a, c) =>
              Completion(a, "alias", s"alias of $c") })
      case _ =>
        val cols = for {
          s <- session.toSeq
          coll <- collectionInScope(toks).toSeq
          d <- s.collections.get(coll).orElse(
            s.aliases.get(coll).flatMap(s.collections.get)).toSeq
          if whereInScope(toks)
          c <- d.df.columns.toSeq
        } yield Completion(c, "column", s"column of $coll")
        cols ++ keywords.keys.toSeq.sorted.map(k =>
          Completion(k, "keyword", keywords(k)))
    }
    val p = partial.toUpperCase(java.util.Locale.ROOT)
    if (p.isEmpty) items
    else items.filter(_.label.toUpperCase(java.util.Locale.ROOT).startsWith(p))
  }

  private def tokenAt(text: String, offset: Int): String = {
    var j = offset
    while (j < text.length && (text.charAt(j).isLetterOrDigit ||
      text.charAt(j) == '_' || text.charAt(j) == '.')) j += 1
    text.substring(offset, j)
  }

  private def collectionInScope(toks: Vector[(Lexer.Tok, Int)]): Option[String] = {
    val names = toks.sliding(2).collect {
      case Vector((Lexer.TIdent(kw), _), (Lexer.TIdent(name), _))
        if kw.equalsIgnoreCase("from") || kw.equalsIgnoreCase("into") => name
    }.toSeq
    names.lastOption
  }

  private def whereInScope(toks: Vector[(Lexer.Tok, Int)]): Boolean =
    toks.exists { case (Lexer.TIdent(s), _) =>
      s.equalsIgnoreCase("where")
    case _ => false }

  private def collectionDetail(s: NeedleSession, name: String): String =
    s.collections.get(name).map { d =>
      s"collection · ${d.df.columns.length} columns · metric ${d.metric}"
    }.getOrElse("collection")

  /** Hover at an offset: keyword doc, collection summary, or column
    * membership.
    */
  def hover(text: String, offset: Int,
            session: Option[NeedleSession] = None): Option[String] = {
    val toks =
      try Lexer.tokenizeWithOffsets(text)
      catch { case _: Lexer.LexError => return None }
    val at = toks.collectFirst {
      case (Lexer.TIdent(s), off)
        if off <= offset && offset < off + s.length => s
    }
    at.flatMap { word =>
      val up = word.toUpperCase(java.util.Locale.ROOT)
      keywords.get(up)
        .orElse(session.flatMap(s =>
          s.collections.get(word).map(_ => collectionDetail(s, word))))
        .orElse(session.flatMap { s =>
          collectionInScope(toks).flatMap(c =>
            s.collections.get(c).filter(_.df.columns.contains(word))
              .map(d => s"$word: column of $c (${
                d.df.schema(word).dataType.simpleString})"))
        })
    }
  }
}

/** Minimal JSON-RPC 2.0 LSP server over [[LanguageService]]: handles
  * initialize, textDocument/didOpen, textDocument/didChange (full sync),
  * textDocument/completion, textDocument/hover, shutdown. One message in
  * → optional response out, plus publishDiagnostics notifications after
  * document changes — frameable over stdio by any host loop.
  */
final class LspServer(session: Option[NeedleSession] = None) {
  import LanguageService._

  private val mapper = new ObjectMapper()
  private val docs = scala.collection.mutable.Map.empty[String, String]

  /** Notifications queued by the last handle() call (diagnostics). */
  def handle(message: String): (Option[String], Seq[String]) = {
    val req = mapper.readTree(message)
    val id = Option(req.get("id"))
    val method = Option(req.get("method")).map(_.asText()).getOrElse("")
    def respond(result: JsonNode): Option[String] = id.map { i =>
      val o = mapper.createObjectNode()
      o.put("jsonrpc", "2.0").set[JsonNode]("id", i)
      o.set[JsonNode]("result", result)
      mapper.writeValueAsString(o)
    }
    def params = req.get("params")
    def uri = params.get("textDocument").get("uri").asText()
    def offsetOf(doc: String, pos: JsonNode): Int = {
      val line = pos.get("line").asInt(); val ch = pos.get("character").asInt()
      val lines = doc.split("\n", -1)
      lines.take(line).map(_.length + 1).sum + math.min(ch,
        lines.lift(line).map(_.length).getOrElse(0))
    }
    method match {
      case "initialize" =>
        val caps = mapper.createObjectNode()
        val c = caps.putObject("capabilities")
        c.put("textDocumentSync", 1) // full
        c.putObject("completionProvider")
        c.put("hoverProvider", true)
        (respond(caps), Nil)
      case "textDocument/didOpen" =>
        val text = params.get("textDocument").get("text").asText()
        docs(uri) = text
        (None, Seq(diagnosticsNotification(uri, text)))
      case "textDocument/didChange" =>
        val text = params.get("contentChanges").get(0).get("text").asText()
        docs(uri) = text
        (None, Seq(diagnosticsNotification(uri, text)))
      case "textDocument/completion" =>
        val doc = docs.getOrElse(uri, "")
        val items = completions(doc, offsetOf(doc, params.get("position")),
          session)
        val arr = mapper.createArrayNode()
        items.foreach { c =>
          arr.addObject().put("label", c.label)
            .put("kind", c.kind match {
              case "keyword" => 14
              case "column" => 5
              case _ => 7 // class-ish for collections/aliases
            })
            .put("detail", c.detail)
        }
        (respond(arr), Nil)
      case "textDocument/hover" =>
        val doc = docs.getOrElse(uri, "")
        val h = hover(doc, offsetOf(doc, params.get("position")), session)
        val result = h.map { text =>
          val o = mapper.createObjectNode()
          o.putObject("contents").put("kind", "plaintext").put("value", text)
          o: JsonNode
        }.getOrElse(mapper.nullNode())
        (respond(result), Nil)
      case "shutdown" => (respond(mapper.nullNode()), Nil)
      case _ => (None, Nil) // exit / unknown notifications
    }
  }

  private def diagnosticsNotification(uri: String, text: String): String = {
    val o = mapper.createObjectNode()
    o.put("jsonrpc", "2.0").put("method", "textDocument/publishDiagnostics")
    val p = o.putObject("params")
    p.put("uri", uri)
    val arr = p.putArray("diagnostics")
    diagnostics(text, session).foreach { d =>
      val e = arr.addObject()
      val r = e.putObject("range")
      r.putObject("start").put("line", d.start.line)
        .put("character", d.start.character)
      r.putObject("end").put("line", d.end.line)
        .put("character", d.end.character)
      e.put("severity", d.severity).put("message", d.message)
    }
    mapper.writeValueAsString(o)
  }
}
