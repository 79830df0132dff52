package graft.ops

import graft.filter.{Filter, FilterOp, JValue, JNum, JStr, JBool, JArr}

/** Natural-language filter extraction (SURVEY.md §2.2 adjunct; reference:
  * src/search/nl_filter.rs — "documents from last week about ML with
  * score > 0.8" → search text + structured Filter + temporal window).
  *
  * A faithful re-expression of the reference's keyword-pattern machinery:
  * the same default field patterns, value extractors (next-word /
  * comparison / boolean / list), temporal offsets, stop-word list, filter-
  * phrase removal, and confidence formula (nl_filter.rs:121-558). Purely
  * driver-side string work — the produced `Filter` feeds the same
  * FilterCompiler every other filter goes through.
  */
object NlFilter {

  sealed trait Extractor
  private case object NextWord extends Extractor
  private case object Comparison extends Extractor
  private case object BooleanFlag extends Extractor
  private case object ListWords extends Extractor

  private final case class Pattern(keywords: Seq[String], field: String,
                                   extractor: Extractor)

  final case class Temporal(start: Option[Long], end: Option[Long],
                            expression: String)

  final case class Parsed(searchText: String, filter: Option[Filter],
                          temporal: Option[Temporal], confidence: Double,
                          intents: Seq[String])

  // nl_filter.rs:122-166
  private val patterns = Seq(
    Pattern(Seq("category", "type", "kind"), "category", NextWord),
    Pattern(Seq("tagged", "tag", "tags", "labeled"), "tags", ListWords),
    Pattern(Seq("by", "author", "from", "created by"), "author", NextWord),
    Pattern(Seq("score", "rating", "rank"), "score", Comparison),
    Pattern(Seq("price", "cost"), "price", Comparison),
    Pattern(Seq("count", "number", "quantity"), "count", Comparison),
    Pattern(Seq("published", "active", "enabled"), "is_published", BooleanFlag),
    Pattern(Seq("verified", "confirmed"), "is_verified", BooleanFlag))

  // nl_filter.rs:168-205 (keyword → seconds back from now)
  private val temporalPatterns: Seq[(Seq[String], Long)] = Seq(
    (Seq("today"), 0L),
    (Seq("yesterday"), -86400L),
    (Seq("last hour", "past hour"), -3600L),
    (Seq("last day", "past day", "24 hours"), -86400L),
    (Seq("last week", "past week", "this week"), -604800L),
    (Seq("last month", "past month", "this month"), -2592000L),
    (Seq("last year", "past year", "this year"), -31536000L))

  // nl_filter.rs:207-219
  private val stopwords: Set[String] = Set(
    "a", "an", "the", "is", "are", "was", "were", "be", "been", "being",
    "have", "has", "had", "do", "does", "did", "will", "would", "could",
    "should", "may", "might", "must", "shall", "can", "need", "dare",
    "ought", "used", "to", "of", "in", "for", "on", "with", "at", "by",
    "about", "as", "into", "through", "during", "before", "after", "above",
    "below", "between", "under", "again", "further", "then", "once", "here",
    "there", "when", "where", "why", "how", "all", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "just", "also", "now", "show",
    "me", "find", "get", "give", "search", "look")

  def parse(query: String,
            nowEpochS: Long = System.currentTimeMillis() / 1000): Parsed = {
    val lower = query.toLowerCase(java.util.Locale.ROOT)
    val words = lower.split("\\s+").filter(_.nonEmpty).toIndexedSeq

    val intents = Seq.newBuilder[String]
    def containsAny(ps: Seq[String]): Boolean = ps.exists(lower.contains)
    if (containsAny(Seq("show", "find", "search", "get", "look for")))
      intents += "search"
    if (containsAny(Seq("filter", "where", "with", "having"))) intents += "filter"
    if (containsAny(Seq("count", "how many", "total", "sum"))) intents += "aggregate"
    if (containsAny(Seq("not", "without", "exclude", "except"))) intents += "exclude"

    var usedRanges = Vector.empty[(Int, Int)]

    // temporal (first matching pattern wins; nl_filter.rs:252-276)
    val temporal: Option[Temporal] = temporalPatterns.iterator.flatMap {
      case (keywords, offset) =>
        keywords.iterator.flatMap { kw =>
          val pos = lower.indexOf(kw)
          if (pos < 0) None
          else {
            usedRanges :+= (pos, pos + kw.length)
            intents += "temporal"
            Some(Temporal(Some(nowEpochS + offset), Some(nowEpochS), kw))
          }
        }.take(1)
    }.take(1).toSeq.headOption

    // field filters
    val filters = patterns.flatMap { p =>
      extractFilter(words, p) match {
        case Some((f, range)) => usedRanges :+= range; Some(f)
        case None => None
      }
    }
    val combined = filters match {
      case Seq()  => None
      case Seq(f) => Some(f)
      case many   => Some(Filter.And(many))
    }

    val searchText = buildSearchText(query, usedRanges)
    val is = intents.result().distinct
    val confidence = math.min(1.0,
      0.5 + 0.1 * is.size + (if (combined.isDefined) 0.2 else 0.0) +
        (if (temporal.isDefined) 0.1 else 0.0))
    Parsed(searchText, combined, temporal, confidence, is)
  }

  /** Apply the parsed temporal window as an inserted_at Filter. */
  def temporalFilter(t: Temporal, field: String = "inserted_at"): Filter = {
    val conds = t.start.map(s =>
      Filter.Condition(field, FilterOp.Gte, JNum(s.toDouble))).toSeq ++
      t.end.map(e => Filter.Condition(field, FilterOp.Lte, JNum(e.toDouble)))
    if (conds.size == 1) conds.head else Filter.And(conds)
  }

  // ---------------------------------------------------------------- private

  private def findWordPosition(words: IndexedSeq[String], keyword: String): Option[Int] = {
    val kws = keyword.split("\\s+")
    if (kws.length == 1) words.indexWhere(_.startsWith(keyword)) match {
      case -1 => None; case i => Some(i)
    }
    else (0 to words.length - kws.length).find(i =>
      kws.zipWithIndex.forall { case (kw, j) => words(i + j).startsWith(kw) })
  }

  private def charStart(words: IndexedSeq[String], wordPos: Int): Int =
    words.take(wordPos).map(_.length + 1).sum

  private def extractFilter(words: IndexedSeq[String],
                            p: Pattern): Option[(Filter, (Int, Int))] = {
    p.keywords.iterator.flatMap { kw =>
      findWordPosition(words, kw).flatMap { pos =>
        val start = charStart(words, pos)
        p.extractor match {
          case NextWord if pos + 1 < words.length =>
            val value = words(pos + 1).dropWhile(!_.isLetterOrDigit)
              .reverse.dropWhile(!_.isLetterOrDigit).reverse
            if (value.nonEmpty && !stopwords(value))
              Some((Filter.Condition(p.field, FilterOp.Eq, JStr(value)),
                (start, start + kw.length + 1 + value.length)))
            else None
          case Comparison =>
            extractComparison(words, pos).map { case (op, v, extraLen) =>
              (Filter.Condition(p.field, op, JNum(v)),
                (start, start + kw.length + extraLen))
            }
          case BooleanFlag =>
            val negated = pos > 0 && (words(pos - 1) == "not" || words(pos - 1) == "un")
            Some((Filter.Condition(p.field, FilterOp.Eq, JBool(!negated)),
              (start, start + kw.length)))
          case ListWords if pos + 1 < words.length =>
            var values = Vector.empty[JValue]
            var endPos = pos + 1
            var i = pos + 1
            var done = false
            while (i < words.length && !done) {
              val w = words(i).filter(_.isLetterOrDigit)
              if (stopwords(w) || w == "and" || w == "or") { i += 1 }
              else if (w.isEmpty) done = true
              else {
                values :+= JStr(w)
                endPos = i + 1
                if (!words(i).endsWith(",")) done = true
                i += 1
              }
            }
            if (values.nonEmpty)
              Some((Filter.Condition(p.field, FilterOp.In, JArr(values)),
                (start, charStart(words, endPos))))
            else None
          case _ => None
        }
      }
    }.take(1).toSeq.headOption
  }

  /** "score > 0.8" / "score greater than 0.8" / "score at least 0.8"
    * (nl_filter.rs:436-497).
    */
  private def extractComparison(words: IndexedSeq[String],
                                kwPos: Int): Option[(FilterOp, Double, Int)] = {
    var pos = kwPos + 1
    var op: FilterOp = FilterOp.Eq
    var extraLen = 0
    if (pos >= words.length) return None
    val w = words(pos)
    if (w == ">" || w == "greater" || w == "more" || w == "above") {
      op = FilterOp.Gt; extraLen += w.length + 1; pos += 1
      if (pos < words.length && words(pos) == "than") { extraLen += 5; pos += 1 }
    } else if (w == ">=" ) {
      op = FilterOp.Gte; extraLen += w.length + 1; pos += 1
    } else if (w == "at" && pos + 1 < words.length && words(pos + 1) == "least") {
      op = FilterOp.Gte; extraLen += w.length + 1 + 6; pos += 2
    } else if (w == "<" || w == "less" || w == "under" || w == "below") {
      op = FilterOp.Lt; extraLen += w.length + 1; pos += 1
      if (pos < words.length && words(pos) == "than") { extraLen += 5; pos += 1 }
    } else if (w == "<=") {
      op = FilterOp.Lte; extraLen += w.length + 1; pos += 1
    } else if (w == "at" && pos + 1 < words.length && words(pos + 1) == "most") {
      op = FilterOp.Lte; extraLen += w.length + 1 + 5; pos += 2
    } else if (w == "at") {
      // reference quirk kept: bare "at" reads as >= ("score at 5" → >= 5)
      op = FilterOp.Gte; extraLen += w.length + 1; pos += 1
    } else if (w == "=" || w == "equals" || w == "is" || w == "of") {
      extraLen += w.length + 1; pos += 1
    }
    if (pos < words.length) words(pos).toDoubleOption.map { v =>
      (op, v, extraLen + words(pos).length)
    } else None
  }

  private def buildSearchText(query: String, used: Seq[(Int, Int)]): String = {
    val kept = if (used.isEmpty) query else {
      val sorted = used.sortBy(_._1)
      val sb = new StringBuilder
      var lastEnd = 0
      sorted.foreach { case (s, e) =>
        if (s > lastEnd) sb.append(query.substring(lastEnd, math.min(s, query.length)))
        lastEnd = math.max(e, lastEnd)
      }
      if (lastEnd < query.length) sb.append(query.substring(lastEnd))
      sb.toString
    }
    kept.split("\\s+").filter(_.nonEmpty)
      .filter(w => !stopwords(w.toLowerCase(java.util.Locale.ROOT)) || w.length > 3)
      .mkString(" ").trim
  }
}
