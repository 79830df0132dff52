package graft.needleql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.filter.Filter
import graft.ops.NlFilter

/** Visual query builder (reference: src/search/query_builder.rs): natural
  * language → NeedleQL with intent analysis, optimization hints against a
  * collection profile, quality scoring, improvement suggestions and
  * alternative formulations.
  *
  * The analysis layer is deterministic driver-side logic (it inspects a
  * QUERY, not data). The Spark twist is [[profileOf]]: the reference keeps
  * a manually-maintained `CollectionProfile`; here the profile derives from
  * the actual DataFrame in one aggregation pass (count, per-field
  * approx-distinct cardinality) plus a bounded sample for field values.
  */
object QueryBuilder {

  // ------------------------------------------------------------- profile
  /** Field types (query_builder.rs:57-75). */
  sealed abstract class FieldType(val name: String)
  object FieldType {
    case object Str extends FieldType("string")
    case object Num extends FieldType("number")
    case object Bool extends FieldType("boolean")
    case object DateTime extends FieldType("datetime")
    case object Arr extends FieldType("array")
  }

  final case class FieldProfile(name: String, fieldType: FieldType,
                                cardinality: Long = 0L, indexed: Boolean = false,
                                sampleValues: Seq[String] = Nil)
  final case class IndexProfile(efSearch: Int = 50,
                                quantization: Option[String] = None)
  final case class CollectionStats(cacheHitRate: Double = 0.0)
  final case class CollectionProfile(name: String, dimensions: Int,
                                     vectorCount: Long,
                                     metadataFields: Seq[FieldProfile] = Nil,
                                     indexConfig: IndexProfile = IndexProfile(),
                                     stats: CollectionStats = CollectionStats())

  /** Derive a profile from a real collection DataFrame: one aggregation for
    * row count + per-field cardinality (approx_count_distinct — exact
    * distinct would shuffle the corpus per field), one bounded head for
    * sample values, one row for the vector dimension.
    */
  def profileOf(df: DataFrame, name: String, vecCol: String,
                metaFields: Seq[(String, FieldType)],
                indexed: Set[String] = Set.empty,
                indexConfig: IndexProfile = IndexProfile(),
                stats: CollectionStats = CollectionStats()): CollectionProfile = {
    val aggs = count(lit(1)).as("__n") +:
      metaFields.map { case (f, _) => approx_count_distinct(col(f)).as(s"__c_$f") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    val cards = metaFields.zipWithIndex.map { case ((f, _), i) => f -> row.getLong(i + 1) }.toMap
    val dim = df.select(size(col(vecCol))).limit(1).head().getInt(0)
    val samples: Map[String, Seq[String]] =
      if (metaFields.isEmpty) Map.empty
      else {
        val head = df.select(metaFields.map { case (f, _) => col(f).cast("string") }: _*)
          .limit(20).collect()
        metaFields.map(_._1).zipWithIndex.map { case (f, i) =>
          f -> head.map(r => Option(r.getString(i)).getOrElse("null"))
            .distinct.take(5).toSeq
        }.toMap
      }
    CollectionProfile(name, dim, n,
      metaFields.map { case (f, t) =>
        FieldProfile(f, t, cards(f), indexed(f), samples.getOrElse(f, Nil))
      },
      indexConfig, stats)
  }

  // ------------------------------------------------------------- analysis
  /** Query classes (query_builder.rs:96-110). */
  val Semantic = "semantic"; val Hybrid = "hybrid"
  val MetadataOnly = "metadata_only"; val Temporal = "temporal"
  val Aggregation = "aggregation"

  val Simple = "simple"; val Moderate = "moderate"; val Complex = "complex"

  final case class PatternHit(patternType: String, matched: String, start: Int)
  final case class Analysis(queryClass: String, complexity: String,
                            searchTerms: Seq[String], filterFields: Seq[String],
                            temporal: Option[NlFilter.Temporal],
                            confidence: Double, patterns: Seq[PatternHit])

  /** Keyword → pattern-type table (query_builder.rs:244-305). */
  private val analyzerPatterns: Seq[(String, Seq[String])] = Seq(
    "search_keyword" -> Seq("find", "search", "show", "get", "look for", "retrieve"),
    "filter_clause" -> Seq("where", "with", "having", "that have", "containing"),
    "temporal_expression" -> Seq("today", "yesterday", "last week", "last month",
      "recent", "latest", "from", "since", "before", "after"),
    "comparison" -> Seq("greater than", "less than", "more than", "at least",
      "at most", "above", "below", ">", "<", ">=", "<="),
    "negation" -> Seq("not", "without", "except", "exclude", "excluding"),
    "list_value" -> Seq("or", "and", ",", "either"),
    "range_expression" -> Seq("between", "from...to", "range"),
    "aggregation" -> Seq("count", "how many", "total", "sum", "average", "group by"),
    "sort_order" -> Seq("sort by", "order by", "sorted", "ranked", "top",
      "best", "highest", "lowest"))

  private def detectPatterns(lower: String): Seq[PatternHit] =
    analyzerPatterns.flatMap { case (ptype, kws) =>
      kws.flatMap { kw =>
        val pos = lower.indexOf(kw)
        if (pos >= 0) Some(PatternHit(ptype, kw, pos)) else None
      }
    }.sortBy(_.start)

  private def filterDepth(f: Filter): Int = f match {
    case Filter.And(fs) => 1 + fs.map(filterDepth).sum
    case Filter.Or(fs)  => 1 + fs.map(filterDepth).sum
    case Filter.Not(in) => 1 + filterDepth(in)
    case _              => 1
  }

  private def filterFields(f: Filter, acc: Seq[String] = Nil): Seq[String] = f match {
    case Filter.And(fs) => fs.foldLeft(acc)((a, x) => filterFields(x, a))
    case Filter.Or(fs)  => fs.foldLeft(acc)((a, x) => filterFields(x, a))
    case Filter.Not(in) => filterFields(in, acc)
    case Filter.Condition(field, _, _) =>
      if (acc.contains(field)) acc else acc :+ field
  }

  /** Analyze a natural-language query (query_builder.rs:312-345). */
  def analyze(nl: String): Analysis = {
    val parsed = NlFilter.parse(nl)
    val lower = nl.toLowerCase(java.util.Locale.ROOT)
    val patterns = detectPatterns(lower)
    val hasSearch = parsed.searchText.trim.nonEmpty
    val hasFilter = parsed.filter.isDefined
    val hasTemporal = parsed.temporal.isDefined
    val hasAgg = patterns.exists(_.patternType == "aggregation")

    val queryClass =
      if (hasAgg) Aggregation
      else if (hasTemporal && !hasSearch && !hasFilter) Temporal
      else (hasSearch, hasFilter) match {
        case (true, true)   => Hybrid
        case (true, false)  => Semantic
        case (false, true)  => MetadataOnly
        case (false, false) => Semantic // temporal-only already handled
      }

    // complexity score (query_builder.rs:397-440)
    var score = parsed.filter.map(filterDepth).getOrElse(0)
    score += patterns.size
    if (hasTemporal) score += 2
    if (hasAgg) score += 3
    if (patterns.exists(_.patternType == "negation")) score += 1
    val complexity =
      if (score <= 3) Simple else if (score <= 7) Moderate else Complex

    Analysis(queryClass, complexity,
      parsed.searchText.split("\\s+").filter(_.length > 2).map(_.toLowerCase(java.util.Locale.ROOT)).toSeq,
      parsed.filter.map(f => filterFields(f)).getOrElse(Nil),
      parsed.temporal, parsed.confidence, patterns)
  }

  // ---------------------------------------------------------------- hints
  /** Severities (ordered: info < suggestion < warning < critical). */
  val Info = 0; val SuggestionSev = 1; val Warning = 2; val Critical = 3

  final case class Hint(category: String, severity: Int, message: String,
                        suggestion: String, latencyChangePct: Double,
                        memoryChangePct: Double, recallChangePct: Double)

  /** The reference's six hint rules (query_builder.rs:520-655), evaluated
    * in order then sorted by severity descending (stable).
    */
  def hints(analysis: Analysis, profile: CollectionProfile): Seq[Hint] = {
    val out = Seq.newBuilder[Hint]
    analysis.filterFields.foreach { field =>
      profile.metadataFields.find(_.name == field).foreach { fp =>
        if (!fp.indexed && fp.cardinality > 100)
          out += Hint("index_usage", Warning,
            s"Field '$field' is not indexed but has high cardinality (${fp.cardinality})",
            s"Consider adding an index on '$field' for faster filtering",
            -30.0, 5.0, 0.0)
      }
    }
    if (analysis.complexity == Complex)
      out += Hint("query_structure", SuggestionSev,
        "Query has high complexity which may impact performance",
        "Consider breaking into multiple simpler queries or pre-filtering",
        -20.0, -10.0, 0.0)
    if (profile.vectorCount > 100000 && analysis.filterFields.isEmpty)
      out += Hint("filter_order", SuggestionSev,
        "Large collection without pre-filters may have higher latency",
        "Add metadata filters to reduce search space", -40.0, -20.0, 0.0)
    if (profile.vectorCount > 500000 && profile.indexConfig.quantization.isEmpty)
      out += Hint("quantization", SuggestionSev,
        "Large collection without quantization uses significant memory",
        "Consider enabling scalar or product quantization", 5.0, -75.0, -2.0)
    if (analysis.queryClass == Semantic && profile.indexConfig.efSearch < 100)
      out += Hint("search_parameters", Info,
        s"ef_search=${profile.indexConfig.efSearch} may trade recall for speed",
        "Increase ef_search to 100-200 for higher recall", 30.0, 0.0, 10.0)
    if (profile.stats.cacheHitRate < 0.3 && analysis.complexity == Simple)
      out += Hint("caching", Info,
        "Simple query pattern may benefit from result caching",
        "Enable query result caching for repeated similar queries",
        -80.0, 10.0, 0.0)
    out.result().sortBy(-_.severity)
  }

  // ------------------------------------------------------------ translate
  /** NL → NeedleQL (query_builder.rs:774-830): placeholder params per
    * filter-field type, temporal lower bound on created_at, LIMIT from
    * complexity. The generated string round-trips through [[Parser]].
    */
  def translate(analysis: Analysis, profile: CollectionProfile): String = {
    val parts = Seq.newBuilder[String]
    parts += "SELECT *"
    parts += s"FROM ${profile.name}"
    val where = Seq.newBuilder[String]
    if (analysis.queryClass != MetadataOnly && analysis.queryClass != Aggregation)
      where += "vector SIMILAR TO $query"
    analysis.filterFields.foreach { field =>
      profile.metadataFields.find(_.name == field).foreach { fp =>
        where += (fp.fieldType match {
          case FieldType.Str      => s"$field = $$${field}Filter"
          case FieldType.Num      => s"$field >= $$${field}_min"
          case FieldType.Bool     => s"$field = true"
          case FieldType.DateTime => s"$field >= $$${field}Start"
          case FieldType.Arr      => s"$field IN ($$${field}Values)"
        })
      }
    }
    analysis.temporal.flatMap(_.start).foreach(s => where += s"created_at >= $s")
    val wps = where.result()
    if (wps.nonEmpty) parts += s"WHERE ${wps.mkString(" AND ")}"
    val limit = analysis.complexity match {
      case Simple => 10; case Moderate => 20; case _ => 50
    }
    parts += s"LIMIT $limit"
    parts.result().mkString(" ")
  }

  final case class ParsedInfo(collection: String, hasFilter: Boolean,
                              hasSimilarTo: Boolean, limit: Option[Long])

  private def hasSimilarTo(e: Ast.Expression): Boolean = e match {
    case _: Ast.SimilarTo     => true
    case Ast.AndExpr(l, r)    => hasSimilarTo(l) || hasSimilarTo(r)
    case Ast.OrExpr(l, r)     => hasSimilarTo(l) || hasSimilarTo(r)
    case Ast.NotExpr(in)      => hasSimilarTo(in)
    case _                    => false
  }

  /** Parse-validate a generated query (query_builder.rs:833-858). */
  def validate(needleql: String): Option[ParsedInfo] =
    try Parser.parse(needleql) match {
      case Ast.SelectStmt(q) =>
        Some(ParsedInfo(q.from, q.where.isDefined,
          q.where.exists(hasSimilarTo), q.limit))
      case _ => None
    } catch { case _: Throwable => None }

  // -------------------------------------------------------------- quality
  /** Quality score (query_builder.rs:860-890). */
  def quality(analysis: Analysis, hs: Seq[Hint],
              profile: CollectionProfile): Double = {
    var score = 1.0
    hs.foreach { h =>
      score -= (h.severity match {
        case Critical => 0.3
        case Warning => 0.15
        case SuggestionSev => 0.05
        case _ => 0.0
      })
    }
    if (analysis.confidence > 0.8) score += 0.1
    if (profile.vectorCount > 10000 && analysis.filterFields.nonEmpty) score += 0.1
    if (analysis.complexity == Complex) score -= 0.1
    math.max(0.0, math.min(1.0, score))
  }

  // ---------------------------------------------------------- suggestions
  final case class Suggestion(suggestionType: String, message: String,
                              example: Option[String])

  /** Improvement suggestions (query_builder.rs:893-955). */
  def suggestions(analysis: Analysis, qualityScore: Double,
                  profile: CollectionProfile): Seq[Suggestion] = {
    val out = Seq.newBuilder[Suggestion]
    if (analysis.filterFields.isEmpty && profile.vectorCount > 10000 &&
        profile.metadataFields.nonEmpty) {
      val fields = profile.metadataFields.take(3).map(_.name)
      out += Suggestion("add_filter",
        s"Consider filtering by ${fields.mkString(", ")} to narrow results",
        Some(s"...with ${fields.headOption.getOrElse("field")} = 'value'"))
    }
    if (analysis.queryClass == Semantic && analysis.searchTerms.size > 3)
      out += Suggestion("use_hybrid",
        "Multiple search terms detected - hybrid search may improve results",
        Some("Enable hybrid search to combine vector similarity with BM25"))
    if (analysis.temporal.isEmpty &&
        profile.metadataFields.exists(_.fieldType == FieldType.DateTime))
      out += Suggestion("add_temporal",
        "Add a time range to find more relevant recent results",
        Some("...from last week"))
    if (qualityScore < 0.5 && analysis.complexity == Complex)
      out += Suggestion("simplify",
        "Query is complex - consider breaking into multiple searches", None)
    out.result()
  }

  // --------------------------------------------------------- alternatives
  final case class Alternative(needleql: String, description: String,
                               estimatedQuality: Double)

  /** Alternative formulations (query_builder.rs:958-1020). */
  def alternatives(analysis: Analysis,
                   profile: CollectionProfile): Seq[Alternative] = {
    val out = Seq.newBuilder[Alternative]
    if (analysis.filterFields.nonEmpty && analysis.queryClass == Hybrid)
      out += Alternative(
        s"SELECT * FROM ${profile.name} WHERE " +
          analysis.filterFields.map(f => s"$f = $$$f").mkString(" AND ") +
          " LIMIT 100",
        "Filter-first approach: apply metadata filters before vector search",
        0.7)
    if (analysis.complexity != Simple)
      out += Alternative(
        s"SELECT * FROM ${profile.name} WHERE vector SIMILAR TO $$query LIMIT 20",
        "Simpler query: pure vector search without filters", 0.6)
    if (analysis.queryClass == Semantic || analysis.queryClass == Hybrid)
      out += Alternative(
        s"SELECT * FROM ${profile.name} USING RAG(top_k=5, rerank=true) " +
          "WHERE vector SIMILAR TO $query",
        "RAG-optimized: uses reranking for better context retrieval", 0.85)
    out.result()
  }

  // ----------------------------------------------------------------- build
  final case class BuildResult(needleql: String, parsed: Option[ParsedInfo],
                               analysis: Analysis, optimizationHints: Seq[Hint],
                               qualityScore: Double,
                               suggestions: Seq[Suggestion],
                               alternatives: Seq[Alternative])

  /** Build a query from natural language (query_builder.rs:740-772). */
  def build(profile: CollectionProfile, nl: String): BuildResult = {
    val a = analyze(nl)
    val ql = translate(a, profile)
    val hs = hints(a, profile)
    val q = quality(a, hs, profile)
    BuildResult(ql, validate(ql), a, hs, q,
      suggestions(a, q, profile), alternatives(a, profile))
  }

  // ---------------------------------------------------------- autocomplete
  /** Field autocomplete by name prefix (query_builder.rs:1023-1038). */
  def suggestFields(profile: CollectionProfile, partial: String): Seq[FieldProfile] = {
    val p = partial.toLowerCase(java.util.Locale.ROOT)
    profile.metadataFields.filter(_.name.toLowerCase(java.util.Locale.ROOT).startsWith(p))
  }

  /** Sample-value autocomplete for a field (query_builder.rs:1041-1048). */
  def suggestValues(profile: CollectionProfile, field: String): Seq[String] =
    profile.metadataFields.find(_.name == field).map(_.sampleValues).getOrElse(Nil)
}
