package graft

import graft.needleql.{Parser, QueryBuilder => QB}

class QueryBuilderSpec extends SparkSpec {

  private val smallProfile = QB.CollectionProfile("docs", 64, 1000,
    metadataFields = Seq(
      QB.FieldProfile("category", QB.FieldType.Str, cardinality = 500),
      QB.FieldProfile("score", QB.FieldType.Num, cardinality = 1000),
      QB.FieldProfile("created_at", QB.FieldType.DateTime, cardinality = 1000)))

  test("semantic query: SIMILAR TO + complexity-derived LIMIT, round-trips") {
    val r = QB.build(smallProfile, "find documents about spark streaming")
    assert(r.analysis.queryClass == QB.Semantic)
    assert(r.needleql.contains("vector SIMILAR TO $query"))
    assert(r.needleql.startsWith("SELECT * FROM docs"))
    assert(r.parsed.isDefined, s"should parse: ${r.needleql}")
    assert(r.parsed.get.hasSimilarTo)
    assert(r.parsed.get.collection == "docs")
    assert(r.analysis.searchTerms.contains("spark"))
  }

  test("hybrid query: extracted filter fields become typed placeholders") {
    val r = QB.build(smallProfile,
      "find articles with category science and score greater than 80")
    assert(r.analysis.queryClass == QB.Hybrid)
    assert(r.analysis.filterFields.contains("category"))
    assert(r.analysis.filterFields.contains("score"))
    assert(r.needleql.contains("category = $categoryFilter"))
    assert(r.needleql.contains("score >= $score_min"))
    assert(r.parsed.isDefined, s"should parse: ${r.needleql}")
    // unindexed high-cardinality filter fields draw index_usage warnings
    assert(r.optimizationHints.exists(h =>
      h.category == "index_usage" && h.severity == QB.Warning))
  }

  test("aggregation and temporal classes") {
    assert(QB.analyze("how many documents are there").queryClass == QB.Aggregation)
    val t = QB.analyze("documents from last week")
    assert(t.temporal.isDefined)
    val r = QB.build(smallProfile, "documents from last week")
    assert(r.needleql.contains("created_at >="), r.needleql)
    assert(r.parsed.isDefined)
  }

  test("hint rules fire on the profile thresholds") {
    val big = QB.CollectionProfile("big", 384, 600000,
      metadataFields = Seq(QB.FieldProfile("kind", QB.FieldType.Str, 10)),
      indexConfig = QB.IndexProfile(efSearch = 50, quantization = None),
      stats = QB.CollectionStats(cacheHitRate = 0.0))
    val r = QB.build(big, "find things about graphs")
    val cats = r.optimizationHints.map(_.category)
    assert(cats.contains("filter_order"))     // >100k, no filters
    assert(cats.contains("quantization"))     // >500k, no quantization
    assert(cats.contains("search_parameters")) // semantic, ef<100
    assert(cats.contains("caching"))          // low hit rate, simple query
    // sorted by severity descending
    assert(r.optimizationHints.map(_.severity) ==
      r.optimizationHints.map(_.severity).sorted.reverse)
    assert(r.qualityScore >= 0.0 && r.qualityScore <= 1.0)
  }

  test("suggestions: filter / hybrid / temporal rules") {
    val r = QB.build(smallProfile.copy(vectorCount = 50000),
      "find interesting articles about distributed database engines")
    val types = r.suggestions.map(_.suggestionType)
    assert(types.contains("add_filter"))   // no filters, >10k rows
    assert(types.contains("use_hybrid"))   // semantic with >3 terms
    assert(types.contains("add_temporal")) // datetime field present
  }

  test("alternatives parse, including the RAG formulation") {
    val r = QB.build(smallProfile,
      "find articles with category science and score greater than 80")
    assert(r.alternatives.nonEmpty)
    val rag = r.alternatives.find(_.needleql.contains("USING RAG"))
    assert(rag.isDefined)
    r.alternatives.foreach { a =>
      Parser.parse(a.needleql) // must not throw
    }
  }

  test("profileOf derives count/dim/cardinality from a real DataFrame") {
    val emb = sf("embeddings")
    val p = QB.profileOf(emb, "embeddings", "embedding",
      Seq("label" -> QB.FieldType.Num), indexed = Set("label"))
    assert(p.name == "embeddings")
    assert(p.dimensions == 64)
    assert(p.vectorCount == emb.count())
    val label = p.metadataFields.head
    assert(label.indexed)
    assert(label.cardinality > 0)
    assert(label.sampleValues.nonEmpty)
  }

  test("reference analyzer cases verbatim (query_builder.rs tests)") {
    // test_query_analyzer_simple
    val simple = QB.analyze("find articles about machine learning")
    assert(simple.queryClass == QB.Semantic)
    assert(simple.complexity == QB.Simple)
    assert(simple.searchTerms.nonEmpty)
    // test_query_analyzer_with_filter
    val filtered = QB.analyze(
      "show documents category technology with score greater than 0.8")
    assert(filtered.queryClass == QB.Hybrid)
    assert(filtered.filterFields.nonEmpty)
    // test_query_analyzer_temporal
    val temporal = QB.analyze("articles from last week")
    assert(temporal.temporal.isDefined)
    assert(temporal.patterns.exists(_.patternType == "temporal_expression"))
    // test_query_analyzer_aggregation
    assert(QB.analyze("how many documents are in the database").queryClass ==
      QB.Aggregation)
  }

  test("field and value autocomplete") {
    assert(QB.suggestFields(smallProfile, "cat").map(_.name) == Seq("category"))
    val withSamples = smallProfile.copy(metadataFields = Seq(
      QB.FieldProfile("lang", QB.FieldType.Str, 5, sampleValues = Seq("en", "de"))))
    assert(QB.suggestValues(withSamples, "lang") == Seq("en", "de"))
    assert(QB.suggestValues(withSamples, "nope").isEmpty)
  }
}
