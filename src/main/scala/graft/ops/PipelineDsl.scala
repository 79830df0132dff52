package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.filter.{Filter, FilterCompiler}
import graft.functions.Distances

/** Declarative, JSON-serializable search-pipeline DSL (SURVEY.md §2.5;
  * reference: src/search/search_pipeline.rs:106-448).
  *
  * Stages: search → filter → rerank → diversify → limit → threshold →
  * cache. `optimize()` moves filter stages directly after search (the
  * reference's only rewrite — Catalyst then pushes them into the scan
  * anyway, which is the whole point of compiling stages to DataFrame ops).
  * The cache stage is accepted for config compatibility and maps to
  * Spark-level caching (non-semantic, reference: SURVEY.md §4.1).
  */
object PipelineDsl {

  sealed trait Stage { def stageType: String }
  final case class SearchStage(k: Int, efSearch: Option[Int] = None) extends Stage {
    val stageType = "search"
  }
  final case class FilterStage(filter: String, preFilter: Boolean = true) extends Stage {
    val stageType = "filter"
  }
  final case class RerankStage(model: String = "term_overlap",
                               weight: Double = 0.5) extends Stage {
    val stageType = "rerank"
  }
  final case class DiversifyStage(lambda: Double = 0.7, k: Int) extends Stage {
    val stageType = "diversify"
  }
  final case class LimitStage(k: Int) extends Stage { val stageType = "limit" }
  final case class ThresholdStage(maxDistance: Double) extends Stage {
    val stageType = "threshold"
  }
  final case class CacheStage(ttlSecs: Long, maxEntries: Int = 1000) extends Stage {
    val stageType = "cache"
  }

  final case class SearchPipeline(
      name: String,
      description: String = "",
      version: String = "1",
      stages: Seq[Stage] = Nil) {

    def addStage(s: Stage): SearchPipeline = copy(stages = stages :+ s)
    def withDescription(d: String): SearchPipeline = copy(description = d)

    /** Move Filter stages adjacent to Search (reference: :234-252). */
    def optimize(): SearchPipeline = {
      val (searches, rest0) = stages.partition(_.stageType == "search")
      val (filters, rest) = rest0.partition(_.stageType == "filter")
      copy(stages = searches ++ filters ++ rest)
    }

    def summary: String =
      s"$name ($version): ${stages.map(_.stageType).mkString(" -> ")}"

    /** Compile the stage list onto a collection scan. Candidate pools for
      * diversify/rerank stay bounded by the preceding search stage's k.
      */
    def execute(df: DataFrame, vecCol: Column, idCol: String,
                query: Array[Float], metric: String = "cosine",
                queryText: Option[String] = None,
                textCol: Option[String] = None,
                roundTo: Option[Int] = None): DataFrame = {
      var cur = df
      var scored = false
      stages.foreach {
        case SearchStage(k, _) =>
          val raw = Distances.distance(metric, vecCol, lit(query))
          val dist = roundTo.fold(raw)(n => round(raw, n))
          cur = cur.withColumn("distance", dist)
            .orderBy(col("distance").asc, col(idCol).asc)
            .limit(k)
          scored = true
        case FilterStage(json, _) =>
          cur = cur.filter(FilterCompiler.compile(Filter.parse(json), df))
        case RerankStage(_, _) =>
          (queryText, textCol) match {
            case (Some(qt), Some(tc)) =>
              val scores = TermOverlap.rerank(cur, qt, idCol, tc,
                topK = Int.MaxValue)
              cur = cur.drop("score").join(scores.withColumnRenamed("id", idCol), idCol)
                .orderBy(col("score").desc, col(idCol).asc)
            case _ => // no text leg configured: rerank is identity
          }
        case DiversifyStage(lambda, k) =>
          cur = Mmr.diversify(cur, idCol, vecColName(df, vecCol), query, k, lambda)
            .join(df, idCol)
        case LimitStage(k) =>
          cur = (if (scored) cur.orderBy(col("distance").asc, col(idCol).asc)
                 else cur).limit(k)
        case ThresholdStage(maxD) =>
          cur = cur.filter(col("distance") <= maxD)
        case CacheStage(_, _) =>
          cur = cur.cache()
      }
      cur
    }

    private def vecColName(df: DataFrame, vecCol: Column): String =
      df.columns.find(c => col(c).toString == vecCol.toString)
        .getOrElse(df.columns.find(_.contains("vec"))
          .getOrElse(df.columns.find(_.contains("embedding")).getOrElse("vector")))

    // ------------------------------------------------------------ JSON io
    def toJson: String = {
      def stageJson(s: Stage): String = s match {
        case SearchStage(k, ef) =>
          s"""{"type":"search","k":$k${ef.fold("")(e => s""","ef_search":$e""")}}"""
        case FilterStage(f, _) => s"""{"type":"filter","filter":${quote(f)}}"""
        case RerankStage(m, w) => s"""{"type":"rerank","model":${quote(m)},"weight":$w}"""
        case DiversifyStage(l, k) => s"""{"type":"diversify","lambda":$l,"k":$k}"""
        case LimitStage(k) => s"""{"type":"limit","k":$k}"""
        case ThresholdStage(d) => s"""{"type":"threshold","max_distance":$d}"""
        case CacheStage(t, m) => s"""{"type":"cache","ttl_secs":$t,"max_entries":$m}"""
      }
      s"""{"name":${quote(name)},"description":${quote(description)},""" +
        s""""version":${quote(version)},"stages":[${stages.map(stageJson).mkString(",")}]}"""
    }

    private def quote(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }

  object SearchPipeline {
    def apply(name: String): SearchPipeline = new SearchPipeline(name)

    def fromJson(json: String): SearchPipeline = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = mapper.readTree(json)
      val stages = (0 until n.get("stages").size()).map { i =>
        val s = n.get("stages").get(i)
        s.get("type").asText() match {
          case "search" => SearchStage(s.get("k").asInt(),
            Option(s.get("ef_search")).map(_.asInt()))
          case "filter" => FilterStage(s.get("filter").asText())
          case "rerank" => RerankStage(s.get("model").asText(),
            s.get("weight").asDouble())
          case "diversify" => DiversifyStage(s.get("lambda").asDouble(),
            s.get("k").asInt())
          case "limit" => LimitStage(s.get("k").asInt())
          case "threshold" => ThresholdStage(s.get("max_distance").asDouble())
          case "cache" => CacheStage(s.get("ttl_secs").asLong(),
            s.get("max_entries").asInt())
        }
      }
      SearchPipeline(n.get("name").asText(),
        Option(n.get("description")).map(_.asText()).getOrElse(""),
        Option(n.get("version")).map(_.asText()).getOrElse("1"),
        stages)
    }
  }

  /** The 10 built-in templates (reference: :281-448). */
  object Templates {
    def simpleRag(k: Int) = SearchPipeline("simple-rag")
      .withDescription("Basic vector search with top-k")
      .addStage(SearchStage(k * 3)).addStage(LimitStage(k))
    def filteredRag(k: Int, filter: String) = SearchPipeline("filtered-rag")
      .withDescription("Vector search with metadata filter")
      .addStage(SearchStage(k * 5)).addStage(FilterStage(filter))
      .addStage(LimitStage(k))
    def diverseRag(k: Int, lambda: Double) = SearchPipeline("diverse-rag")
      .withDescription("Vector search with MMR diversification")
      .addStage(SearchStage(k * 5)).addStage(DiversifyStage(lambda, k))
    def rerankedRag(k: Int) = SearchPipeline("reranked-rag")
      .withDescription("Vector search with reranking")
      .addStage(SearchStage(k * 10)).addStage(RerankStage())
      .addStage(LimitStage(k))
    def highRecall(k: Int, maxDistance: Double) = SearchPipeline("high-recall")
      .withDescription("High-recall search with distance threshold")
      .addStage(SearchStage(k * 10)).addStage(ThresholdStage(maxDistance))
      .addStage(LimitStage(k))
    def cachedSearch(k: Int, ttlSecs: Long) = SearchPipeline("cached-search")
      .withDescription("Cached vector search for repeated queries")
      .addStage(CacheStage(ttlSecs)).addStage(SearchStage(k * 3))
      .addStage(LimitStage(k))
    def fullRag(k: Int, filter: String) = SearchPipeline("full-rag")
      .withDescription("Complete RAG pipeline with all stages")
      .addStage(SearchStage(k * 10)).addStage(FilterStage(filter))
      .addStage(RerankStage()).addStage(DiversifyStage(0.7, k))
    def semanticDedup(k: Int, threshold: Double) = SearchPipeline("semantic-dedup")
      .withDescription("Find unique results by removing near-duplicates")
      .addStage(SearchStage(k * 5)).addStage(ThresholdStage(threshold))
      .addStage(DiversifyStage(0.5, k))
    def precisionSearch(k: Int) = SearchPipeline("precision-search")
      .withDescription("High-precision search")
      .addStage(SearchStage(k * 2)).addStage(LimitStage(k))
    def multiFilter(k: Int, filters: Seq[String]) = {
      val base = SearchPipeline("multi-filter")
        .withDescription("Search with multiple cascading filters")
        .addStage(SearchStage(k * 10))
      filters.foldLeft(base)((p, f) => p.addStage(FilterStage(f)))
        .addStage(LimitStage(k))
    }
    val list: Seq[String] = Seq("simple-rag", "filtered-rag", "diverse-rag",
      "reranked-rag", "high-recall", "cached-search", "full-rag",
      "semantic-dedup", "precision-search", "multi-filter")
  }
}
