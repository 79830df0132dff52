package graft.needleql

import Ast._
import Lexer._

/** Recursive-descent NeedleQL parser (reference:
  * src/search/query_lang/parser.rs plus the service-layer statement grammar
  * of src/search/needleql_executor.rs).
  *
  * Grammar (case-insensitive keywords):
  *   statement  := [EXPLAIN [ANALYZE]] select | insert | delete | ddl
  *   select     := SELECT (*|cols) FROM ident
  *                 [NEAREST_TO '(' vector [, str] [, num] ')']
  *                 [AS OF (num|str)]
  *                 [WITH TIME_DECAY '(' ident [, ident = value]* ')']
  *                 [USING RAG '(' [ident = value]* ')']
  *                 [WHERE expr] [RERANK BY rerank] [ORDER BY ord [, ord]*]
  *                 [LIMIT n] [OFFSET n]
  *   search     := SEARCH NEAR $param FROM ident [WHERE expr] [LIMIT n]
  *   expr       := orExpr;  orExpr := andExpr (OR andExpr)*
  *   andExpr    := unary (AND unary)*
  *   unary      := NOT unary | '(' expr ')' | predicate
  *   predicate  := col SIMILAR TO $p | col [NOT] IN (...) | col [NOT] BETWEEN a AND b
  *               | col [NOT] LIKE str | col IS [NOT] NULL | col (=|!=|<|<=|>|>=) lit
  *   Validation: TIME_DECAY requires a SIMILAR TO / NEAREST_TO
  *   (reference: parser.rs:896).
  */
object Parser {

  final case class ParseError(msg: String)
    extends RuntimeException(s"Parse error: $msg")

  def parse(input: String): Statement = new P(Lexer.tokenize(input)).statement()

  /** Parse with error positions: Right(statement), or Left(message,
    * 0-based character offset of the token the parser stopped at) — the
    * substrate the language service's diagnostics build ranges from.
    * Lex errors carry their own offset already.
    */
  def parseWithPos(input: String): Either[(String, Int), Statement] = {
    val withOff =
      try Lexer.tokenizeWithOffsets(input)
      catch { case e: Lexer.LexError => return Left((e.msg, e.pos)) }
    val p = new P(withOff.map(_._1))
    try Right(p.statement())
    catch {
      case e: ParseError =>
        val off = withOff(math.min(p.position, withOff.length - 1))._2
        Left((e.msg, off))
    }
  }

  /** Parse a query (SELECT/SEARCH NEAR only), validated. */
  def parseQuery(input: String): Query = parse(input) match {
    case SelectStmt(q)     => q
    case ExplainStmt(q, a) => q.copy(explain = true, analyze = a)
    case other             => throw ParseError(s"Expected a query, got $other")
  }

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    /** Token index the parser stopped at (for diagnostics positions). */
    def position: Int = pos
    private def cur: Tok = toks(pos)
    private def advance(): Tok = { val t = cur; pos += 1; t }
    private def isKw(t: Tok, kw: String): Boolean = t match {
      case TIdent(s) => s.equalsIgnoreCase(kw)
      case _         => false
    }
    private def atKw(kw: String): Boolean = isKw(cur, kw)
    private def eatKw(kw: String): Unit =
      if (atKw(kw)) pos += 1 else throw ParseError(s"Expected $kw, got $cur")
    private def tryKw(kw: String): Boolean =
      if (atKw(kw)) { pos += 1; true } else false
    private def eatOp(op: String): Unit = cur match {
      case TOp(o) if o == op => pos += 1
      case other             => throw ParseError(s"Expected '$op', got $other")
    }
    private def tryOp(op: String): Boolean = cur match {
      case TOp(o) if o == op => pos += 1; true
      case _                 => false
    }
    private def ident(): String = advance() match {
      case TIdent(s) => s
      case other     => throw ParseError(s"Expected identifier, got $other")
    }
    private def stringLit(): String = advance() match {
      case TStr(s) => s
      case other   => throw ParseError(s"Expected string literal, got $other")
    }
    private def number(): Double = advance() match {
      case TNum(d) => d
      case other   => throw ParseError(s"Expected number, got $other")
    }

    def statement(): Statement = {
      val stmt =
        if (atKw("explain")) {
          pos += 1
          val analyze = tryKw("analyze")
          ExplainStmt(select(), analyze)
        }
        else if (atKw("select")) SelectStmt(select())
        else if (atKw("search")) SelectStmt(searchNear())
        else if (atKw("insert")) insert()
        else if (atKw("delete")) delete()
        else if (atKw("create")) { eatKw("create")
          val materialized = tryKw("materialized")
          if (materialized || atKw("view")) { eatKw("view")
            val name = ident()
            eatKw("as")
            CreateViewStmt(name, materialized, select()) }
          else { eatKw("collection")
            val name = ident()
            val opts = if (tryKw("with")) optionMap() else Map.empty[String, String]
            CreateCollectionStmt(name, opts) } }
        else if (atKw("drop")) { eatKw("drop")
          if (tryKw("view")) DropViewStmt(ident())
          else { eatKw("collection"); DropCollectionStmt(ident()) } }
        else if (atKw("show")) { eatKw("show"); eatKw("collections")
          ShowCollectionsStmt }
        else throw ParseError(s"Expected statement, got $cur")
      cur match {
        case TEof => stmt
        case t    => throw ParseError(s"Unexpected trailing token $t")
      }
    }

    /** SEARCH NEAR $q FROM coll [WHERE ...] [LIMIT n]
      * (reference: parser.rs:159-205) — sugar for SELECT * ... SIMILAR TO.
      */
    private def searchNear(): Query = {
      eatKw("search"); eatKw("near")
      val param = advance() match {
        case TParam(p) => p
        case other     => throw ParseError(s"Expected $$param after NEAR, got $other")
      }
      eatKw("from")
      val coll = ident()
      val where = if (tryKw("where")) Some(expr()) else None
      val lim = if (tryKw("limit")) Some(number().toLong) else None
      val similarTo: Expression = SimilarTo("vector", param)
      validate(Query(select = SelectAll, from = coll,
        where = Some(where.fold(similarTo)(w => AndExpr(similarTo, w))),
        limit = lim))
    }

    private def select(): Query = {
      eatKw("select")
      val sel: SelectClause =
        if (tryOp("*")) SelectAll
        else {
          val cols = Seq.newBuilder[String]
          cols += ident()
          while (tryOp(",")) cols += ident()
          SelectCols(cols.result())
        }
      eatKw("from")
      val coll = ident()

      var q = Query(select = sel, from = coll)

      if (tryKw("nearest_to")) {
        eatOp("(")
        val vec = vectorLit()
        var metricOpt: Option[String] = None
        var ef: Option[Int] = None
        while (tryOp(",")) cur match {
          case TStr(s) => metricOpt = Some(s); pos += 1
          case TNum(d) => ef = Some(d.toInt); pos += 1
          case other   => throw ParseError(s"Unexpected NEAREST_TO arg $other")
        }
        eatOp(")")
        q = q.copy(nearestTo = Some(NearestTo(vec, metricOpt, ef)))
      }
      if (tryKw("hybrid_search")) {
        eatOp("(")
        val text = stringLit()
        var vec: Option[Seq[Float]] = None
        var weight = 0.5
        var rrfK = 60.0
        var argIdx = 0
        while (tryOp(",")) {
          cur match {
            case TOp("[") => vec = Some(vectorLit())
            case TNum(d)  => if (argIdx == 0 && vec.isEmpty || argIdx == 1) {
              if (weight == 0.5 && argIdx <= 1) weight = d else rrfK = d
              pos += 1
            } else { rrfK = d; pos += 1 }
            case other => throw ParseError(s"Unexpected HYBRID_SEARCH arg $other")
          }
          argIdx += 1
        }
        eatOp(")")
        q = q.copy(hybrid = Some(HybridSearch(text, vec, weight, rrfK)))
      }
      if (atKw("as")) { eatKw("as"); eatKw("of")
        // AS OF [TIMESTAMP] n | VERSION n | SNAPSHOT 'name' | 'time expr'
        // (reference: needleql_executor.rs:905-975)
        val asOf: AsOf =
          if (atKw("timestamp")) { advance(); advance() match {
            case TNum(d) => AsOfTimestamp(d.toLong)
            case other   => throw ParseError(s"Expected number after AS OF TIMESTAMP, got $other")
          }}
          else if (atKw("version")) { advance(); advance() match {
            case TNum(d) => AsOfVersion(d.toLong)
            case other   => throw ParseError(s"Expected number after AS OF VERSION, got $other")
          }}
          else if (atKw("snapshot")) { advance(); advance() match {
            case TStr(s) => AsOfSnapshot(s)
            case other   => throw ParseError(s"Expected 'name' after AS OF SNAPSHOT, got $other")
          }}
          else advance() match {
            case TNum(d)      => AsOfTimestamp(d.toLong)
            case TDuration(s) => AsOfTimestamp(s)
            case TStr(s)      => AsOfExpr(s)
            case other        => throw ParseError(s"Expected timestamp after AS OF, got $other")
          }
        q = q.copy(asOf = Some(asOf))
      }
      if (tryKw("with")) {
        eatKw("time_decay")
        eatOp("(")
        val fn = ident().toLowerCase(java.util.Locale.ROOT)
        if (!Set("linear", "exponential", "gaussian", "step").contains(fn))
          throw ParseError(s"Unknown TIME_DECAY function $fn")
        val params = Map.newBuilder[String, Double]
        while (tryOp(",")) {
          val k = ident()
          eatOp("=")
          val v = advance() match {
            case TNum(d)        => d
            case TDuration(sec) => sec.toDouble
            case other          => throw ParseError(s"Bad TIME_DECAY param $other")
          }
          params += k -> v
        }
        eatOp(")")
        q = q.copy(timeDecay = Some(TimeDecayClause(fn, params.result())))
      }
      if (tryKw("using")) {
        eatKw("rag")
        eatOp("(")
        var topK: Option[Int] = None; var rr: Option[Boolean] = None
        var alpha: Option[Double] = None; var dedup: Option[Boolean] = None
        var first = true
        while (!tryOp(")")) {
          if (!first) eatOp(",") else first = false
          val k = ident().toLowerCase(java.util.Locale.ROOT)
          eatOp("=")
          val v = advance()
          (k, v) match {
            case ("top_k", TNum(d))        => topK = Some(d.toInt)
            case ("rerank", TIdent(b))     => rr = Some(b.toBoolean)
            case ("hybrid_alpha", TNum(d)) => alpha = Some(d)
            case ("deduplicate", TIdent(b)) => dedup = Some(b.toBoolean)
            case other => throw ParseError(s"Bad RAG option $other")
          }
        }
        q = q.copy(rag = Some(RagOptions(topK, rr, alpha, dedup)))
      }
      if (tryKw("where")) q = q.copy(where = Some(expr()))
      if (tryKw("rerank")) {
        eatKw("by")
        val strategy: RerankStrategy =
          if (tryKw("mmr")) { eatOp("("); val l = number(); eatOp(")")
            RerankStrategy.Mmr(l) }
          else if (tryKw("rrf")) { eatOp("("); val k = number(); eatOp(")")
            RerankStrategy.Rrf(k.toInt) }
          else if (tryKw("crossencoder") || atKw("cross_encoder")) {
            if (atKw("cross_encoder")) pos += 1
            eatOp("("); val m = stringLit(); eatOp(")")
            RerankStrategy.CrossEncoder(m) }
          else {
            val colName = ident()
            val asc = if (tryKw("desc")) false else { tryKw("asc"); true }
            RerankStrategy.Field(colName, asc)
          }
        val fetchK = if (tryKw("fetch")) Some(number().toInt) else None
        q = q.copy(rerank = Some(RerankClause(strategy, fetchK)))
      }
      if (tryKw("order")) {
        eatKw("by")
        val ords = Seq.newBuilder[(String, Boolean)]
        def one(): Unit = {
          val c = ident()
          val asc = if (tryKw("desc")) false else { tryKw("asc"); true }
          ords += ((c, asc))
        }
        one()
        while (tryOp(",")) one()
        q = q.copy(orderBy = ords.result())
      }
      if (tryKw("limit")) q = q.copy(limit = Some(number().toLong))
      if (tryKw("offset")) q = q.copy(offset = Some(number().toLong))
      validate(q)
    }

    /** `[1.0, 2.0, ...]` */
    private def vectorLit(): Seq[Float] = {
      eatOp("[")
      val vs = Seq.newBuilder[Float]
      if (!tryOp("]")) {
        vs += number().toFloat
        while (tryOp(",")) vs += number().toFloat
        eatOp("]")
      }
      vs.result()
    }

    private def optionMap(): Map[String, String] = {
      eatOp("(")
      val m = Map.newBuilder[String, String]
      var first = true
      while (!tryOp(")")) {
        if (!first) eatOp(",") else first = false
        val k = ident()
        eatOp("=")
        val v = advance() match {
          case TNum(d)   => if (d.isWhole) d.toLong.toString else d.toString
          case TStr(s)   => s
          case TIdent(s) => s
          case other     => throw ParseError(s"Bad option value $other")
        }
        m += k -> v
      }
      m.result()
    }

    /** INSERT INTO coll (id, vector[, metadata]) VALUES ('id', [..][, '{...}']) */
    private def insert(): Statement = {
      eatKw("insert"); eatKw("into")
      val coll = ident()
      // optional column list — accepted and ignored (id, vector, metadata)
      if (tryOp("(")) { while (!tryOp(")")) pos += 1 }
      eatKw("values")
      eatOp("(")
      val id = stringLit()
      eatOp(",")
      val vec = vectorLit()
      val meta = if (tryOp(",")) Some(stringLit()) else None
      eatOp(")")
      InsertStmt(coll, id, vec, meta)
    }

    private def delete(): Statement = {
      eatKw("delete"); eatKw("from")
      val coll = ident()
      val where = if (tryKw("where")) Some(expr()) else None
      DeleteStmt(coll, where)
    }

    // --------------------------------------------------------- expressions
    private def expr(): Expression = orExpr()

    private def orExpr(): Expression = {
      var l = andExpr()
      while (tryKw("or")) l = OrExpr(l, andExpr())
      l
    }
    private def andExpr(): Expression = {
      var l = unary()
      while (tryKw("and")) l = AndExpr(l, unary())
      l
    }
    /** `unary := NOT unary | '(' expr ')' | predicate` recurses, so a
      * hostile `(((((…` or `NOT NOT NOT …` input must hit a LIMIT, not
      * the JVM stack (the filter parser's depth-32 guard, applied to
      * the expression grammar — StackOverflowError is an Error a caller
      * can't usefully catch; ParseError is the contract).
      */
    private var exprDepth = 0
    private val maxExprDepth = 64
    private def unary(): Expression = {
      exprDepth += 1
      if (exprDepth > maxExprDepth)
        throw ParseError(s"expression nesting deeper than $maxExprDepth")
      try {
        if (tryKw("not")) NotExpr(unary())
        else if (tryOp("(")) { val e = expr(); eatOp(")"); e }
        else predicate()
      } finally exprDepth -= 1
    }

    private def predicate(): Expression = {
      val colName = ident()
      if (tryKw("similar")) {
        eatKw("to")
        advance() match {
          case TParam(p) => SimilarTo(colName, p)
          case other     => throw ParseError(s"SIMILAR TO requires $$param, got $other")
        }
      } else if (atKw("not") || atKw("in") || atKw("between") || atKw("like")) {
        val negated = tryKw("not")
        if (tryKw("in")) {
          eatOp("(")
          val vals = Seq.newBuilder[Literal]
          if (!tryOp(")")) {
            vals += literal()
            while (tryOp(",")) vals += literal()
            eatOp(")")
          }
          InList(colName, vals.result(), negated)
        } else if (tryKw("between")) {
          val lo = literal(); eatKw("and"); val hi = literal()
          BetweenExpr(colName, lo, hi, negated)
        } else if (tryKw("like")) {
          LikeExpr(colName, stringLit(), negated)
        } else throw ParseError(s"Expected IN/BETWEEN/LIKE after NOT")
      } else if (tryKw("is")) {
        val negated = tryKw("not")
        eatKw("null")
        IsNullExpr(colName, negated)
      } else cur match {
        case TOp(op @ ("=" | "!=" | "<" | "<=" | ">" | ">=")) =>
          pos += 1
          Comparison(colName, op, literal())
        case other => throw ParseError(s"Expected predicate operator, got $other")
      }
    }

    private def literal(): Literal = advance() match {
      case TStr(s)        => StrLit(s)
      case TNum(d)        => NumLit(d)
      case TParam(p)      => ParamRef(p)
      case TDuration(s)   => DurationLit(s)
      case TIdent(s) if s.equalsIgnoreCase("true")  => BoolLit(true)
      case TIdent(s) if s.equalsIgnoreCase("false") => BoolLit(false)
      case TIdent(s) if s.equalsIgnoreCase("null")  => NullLit
      case other => throw ParseError(s"Expected literal, got $other")
    }
  }

  /** TIME_DECAY requires vector similarity (reference: parser.rs:896). */
  private def validate(q: Query): Query = {
    def hasSimilar(e: Expression): Boolean = e match {
      case _: SimilarTo    => true
      case AndExpr(l, r)   => hasSimilar(l) || hasSimilar(r)
      case OrExpr(l, r)    => hasSimilar(l) || hasSimilar(r)
      case NotExpr(inner)  => hasSimilar(inner)
      case _               => false
    }
    val similar = q.nearestTo.isDefined || q.where.exists(hasSimilar)
    if (q.timeDecay.isDefined && !similar)
      throw ParseError("TIME_DECAY requires a SIMILAR TO / NEAREST_TO clause")
    q
  }
}
