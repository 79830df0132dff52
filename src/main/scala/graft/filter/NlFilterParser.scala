package graft.filter

import scala.util.Try

/** Natural-language filter parser (reference: src/services/search/
  * nl_filter_parser.rs — "category is 'books' and price less than 50" →
  * a MongoDB-style filter). Distinct from [[graft.ops.NlFilter]]
  * (src/search/nl_filter.rs), which extracts filters out of free-text
  * SEARCH queries; this module parses expressions that are filters in
  * their entirety, via keyword pattern rules with longest-match-wins
  * clause resolution (nl_filter_parser.rs:115-173, 283-330).
  *
  * Pure driver-side string work: the produced [[Filter]] feeds the same
  * [[FilterCompiler]] every other filter goes through, so an NL
  * expression ends as an ordinary Catalyst predicate — pushed to the
  * scan like any hand-written filter. Nothing here touches a DataFrame.
  */
object NlFilterParser {

  /** nl_filter_parser.rs:185-196 */
  sealed trait FieldType
  object FieldType {
    case object Str extends FieldType
    case object Number extends FieldType
    case object Bool extends FieldType
    case object Date extends FieldType
    case object Arr extends FieldType
  }

  /** Schema hint for a metadata field (nl_filter_parser.rs:175-183). */
  final case class FieldHint(name: String, valueType: FieldType,
                             knownValues: Seq[String] = Nil)

  /** A single parsed clause (nl_filter_parser.rs:51-61). */
  final case class Clause(field: String, op: FilterOp, value: JValue,
                          sourceText: String)

  /** Parse result (nl_filter_parser.rs:35-49). `filter` is None when the
    * built JSON fails [[Filter.parse]] (the reference's `.ok()`).
    */
  final case class Parsed(filterJson: JValue, filter: Option[Filter],
                          confidence: Double, clauses: Seq[Clause],
                          unparsedRemainder: Option[String])

  private final case class Rule(keywords: Seq[String], op: FilterOp)

  /** nl_filter_parser.rs:115-173 — order matters: on equal keyword
    * length the FIRST rule found wins (strict `>` comparison on match
    * quality, nl_filter_parser.rs:313-318).
    */
  private val rules = Seq(
    Rule(Seq("is", "equals", "equal to", "=", "=="), FilterOp.Eq),
    Rule(Seq("is not", "not equal to", "!=", "isn't"), FilterOp.Ne),
    Rule(Seq("greater than", "more than", "above", "over", "exceeds", ">"),
      FilterOp.Gt),
    Rule(Seq("at least", "greater than or equal to", "no less than", ">="),
      FilterOp.Gte),
    Rule(Seq("less than", "fewer than", "below", "under", "<"), FilterOp.Lt),
    Rule(Seq("at most", "less than or equal to", "no more than", "<="),
      FilterOp.Lte),
    Rule(Seq("contains", "includes", "has"), FilterOp.Contains),
    Rule(Seq("after", "since", "from"), FilterOp.Gt),
    Rule(Seq("before", "until", "by"), FilterOp.Lt))

  private val mongoKey: Map[FilterOp, String] = Map(
    FilterOp.Eq -> "$eq", FilterOp.Ne -> "$ne", FilterOp.Gt -> "$gt",
    FilterOp.Gte -> "$gte", FilterOp.Lt -> "$lt", FilterOp.Lte -> "$lte",
    FilterOp.In -> "$in", FilterOp.NotIn -> "$nin",
    FilterOp.Contains -> "$contains")

  def apply(): NlFilterParser = new NlFilterParser(Map.empty, Map.empty)
}

final class NlFilterParser private (
    hints: Map[String, NlFilterParser.FieldHint],
    aliases: Map[String, String]) {
  import NlFilterParser._

  /** nl_filter_parser.rs:227-230 */
  def addHint(hint: FieldHint): NlFilterParser =
    new NlFilterParser(hints + (hint.name -> hint), aliases)

  /** nl_filter_parser.rs:232-235 */
  def addAlias(alias: String, canonical: String): NlFilterParser =
    new NlFilterParser(hints, aliases + (alias -> canonical))

  /** Parse an NL filter expression (nl_filter_parser.rs:237-281). Throws
    * IllegalArgumentException on empty input or zero parseable clauses,
    * mirroring the reference's InvalidArgument errors.
    */
  def parse(input: String): Parsed = {
    val trimmed = input.trim
    require(trimmed.nonEmpty, "empty filter expression")
    val normalized = trimmed.toLowerCase
    val (conjunction, parts) = splitConjunctions(normalized)
    val attempts = parts.map(p => p -> parseClause(p.trim))
    val clauses = attempts.collect { case (_, Some(c)) => c }
    val unparsed = attempts.collect { case (p, None) => p.trim }
    require(clauses.nonEmpty,
      s"could not parse any filter clauses from: '$trimmed'")
    val filterJson = buildFilterJson(clauses, conjunction)
    Parsed(
      filterJson,
      Try(Filter.parse(filterJson)).toOption,
      clauses.size.toDouble / parts.size,
      clauses,
      if (unparsed.isEmpty) None else Some(unparsed.mkString(", ")))
  }

  /** Single clause like "price less than 50": every rule keyword is
    * substring-searched (first occurrence); the LONGEST keyword with
    * non-empty field and value sides wins, first-found on ties
    * (nl_filter_parser.rs:283-330).
    *
    * DELIBERATE WART — do not "fix" without a reference-divergence
    * adjudication: matching is first-occurrence SUBSTRING `indexOf`,
    * not word-boundary. "distance is 5" matches the `is` INSIDE
    * "d·ist·ance" (field "d", value "tance is 5"), exactly as the
    * reference's `text.find(keyword)` does at nl_filter_parser.rs:295.
    * NlFilterParserSpec pins this behavior both ways.
    */
  private def parseClause(text: String): Option[Clause] = {
    var best: Option[(Clause, Int)] = None
    for (rule <- rules; keyword <- rule.keywords) {
      val pos = text.indexOf(keyword)
      if (pos >= 0) {
        val field = text.substring(0, pos).trim
        val value = text.substring(pos + keyword.length).trim
        if (field.nonEmpty && value.nonEmpty &&
            best.forall(keyword.length > _._2)) {
          val f = resolveField(field)
          best = Some((Clause(f, rule.op, parseValue(value, f), text),
            keyword.length))
        }
      }
    }
    best.map(_._1)
  }

  /** nl_filter_parser.rs:332-340 */
  private def resolveField(raw: String): String = {
    val cleaned = trimQuotes(raw.trim)
    aliases.getOrElse(cleaned, cleaned)
  }

  /** nl_filter_parser.rs:342-377 — hint-guided then auto-detected typing.
    * Integer and float parses both land in [[JNum]] (f64): the compiler's
    * numeric semantics are f64 either way.
    */
  private def parseValue(raw: String, field: String): JValue = {
    val cleaned = trimQuotes(raw.trim)
    hints.get(field) match {
      case Some(h) if h.valueType == FieldType.Number =>
        Try(JNum(cleaned.toDouble)).getOrElse(autoValue(cleaned))
      case Some(h) if h.valueType == FieldType.Bool =>
        cleaned match {
          case "true" | "yes" | "1" => JBool(true)
          case "false" | "no" | "0" => JBool(false)
          case _ => JStr(cleaned)
        }
      case _ => autoValue(cleaned)
    }
  }

  private def autoValue(cleaned: String): JValue =
    Try(JNum(cleaned.toLong.toDouble)).toOption
      .orElse(Try(JNum(cleaned.toDouble)).toOption)
      .orElse(if (cleaned == "true") Some(JBool(true))
              else if (cleaned == "false") Some(JBool(false)) else None)
      .getOrElse(JStr(cleaned))

  /** Rust's trim_matches: strip ALL leading/trailing quote chars. */
  private def trimQuotes(s: String): String =
    s.dropWhile(c => c == '\'' || c == '"')
      .reverse.dropWhile(c => c == '\'' || c == '"').reverse

  /** nl_filter_parser.rs:379-397: one clause stays bare; several wrap in
    * $and / $or.
    */
  private def buildFilterJson(clauses: Seq[Clause],
                              conjunction: String): JValue = {
    def one(c: Clause): JValue =
      JObj(Vector(c.field -> JObj(Vector(mongoKey(c.op) -> c.value))))
    if (clauses.size == 1) one(clauses.head)
    else JObj(Vector(
      (if (conjunction == "or") "$or" else "$and") ->
        JArr(clauses.map(one).toVector)))
  }

  /** " or " has lower precedence and splits first; otherwise " and "
    * (nl_filter_parser.rs:401-421). No mixed conjunctions.
    */
  private def splitConjunctions(input: String): (String, Seq[String]) = {
    val orParts = input.split(" or ", -1).toSeq
    if (orParts.size > 1) ("or", orParts)
    else {
      val andParts = input.split(" and ", -1).toSeq
      if (andParts.size > 1) ("and", andParts) else ("and", Seq(input))
    }
  }
}
