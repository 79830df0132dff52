package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.needleql.{CollectionDef, NeedleSession}

/** End-to-end NeedleQL queries (SURVEY.md §2.9): a raw NeedleQL string is
  * lexed, parsed, validated and compiled onto DataFrames; the oracle is the
  * equivalent ANSI SQL, proving the whole language pipeline, not just the
  * operators underneath.
  */
object NeedleQLQueries {

  private def session(s: SparkSession, dir: String): NeedleSession = {
    val ns = new NeedleSession(s)
    ns.register("events", CollectionDef(
      Tables.load(s, dir, "events"), idCol = "event_id", vectorCol = "none"))
    ns.register("documents", CollectionDef(
      Tables.load(s, dir, "documents"), idCol = "doc_id", vectorCol = "none",
      textCol = Some("text")))
    val emb = Tables.load(s, dir, "embeddings")
    ns.register("embeddings", CollectionDef(
      emb, idCol = "vec_id", vectorCol = "embedding", metric = "cosine"))
    ns.roundDistanceTo = Some(6)
    ns.bind("q", emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray)
    ns
  }

  val defs: Map[String, Q] = Map(
    // Pure metadata query: comparisons + BETWEEN + ORDER BY + LIMIT.
    "needleql_filter" -> Q(
      """SELECT event_id, event_type, value FROM events
        |WHERE event_type = 'click' AND value BETWEEN 50 AND 100
        |ORDER BY event_id LIMIT 100""".stripMargin
    ) { (s, dir) =>
      session(s, dir).sql(
        """SELECT event_id, event_type, value FROM events
          |WHERE event_type = 'click' AND value BETWEEN 50 AND 100
          |ORDER BY event_id LIMIT 100""".stripMargin)
    },

    // Vector similarity through the language: SIMILAR TO $param.
    "needleql_similar" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |FROM embeddings, q
        |ORDER BY distance, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      session(s, dir).sql(
        "SELECT vec_id, distance FROM embeddings WHERE embedding SIMILAR TO $q LIMIT 10")
    },

    // RERANK BY field with FETCH over-fetch: top-20 by distance, reordered
    // by label (desc, id tiebreak), cut to 10 — the result SET depends on
    // the rerank, so the gate observes it (a bare rerank of the top-k
    // would only permute rows the comparer sorts anyway).
    "needleql_rerank_field" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |top20 AS (
        |  SELECT vec_id, label,
        |         round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |  FROM embeddings, q
        |  ORDER BY distance, vec_id LIMIT 20)
        |SELECT vec_id, label, distance FROM top20
        |ORDER BY label DESC, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      session(s, dir).sql(
        "SELECT vec_id, label, distance FROM embeddings WHERE embedding SIMILAR TO $q RERANK BY label DESC FETCH 20 LIMIT 10")
    },

    // LIKE → contains + IN + OR/NOT through the language layer.
    "needleql_like_in" -> Q(
      """SELECT doc_id, lang FROM documents
        |WHERE lang IN ('en', 'fr') AND text LIKE '%spark%'
        |ORDER BY doc_id LIMIT 50""".stripMargin
    ) { (s, dir) =>
      session(s, dir).sql(
        """SELECT doc_id, lang FROM documents
          |WHERE lang IN ('en', 'fr') AND text LIKE '%spark%'
          |ORDER BY doc_id LIMIT 50""".stripMargin)
    },

    // Visual query builder (reference query_builder.rs): NL → intent class
    // → NeedleQL, profile-driven hints, quality score. The profile derives
    // from the embeddings DataFrame in one aggregation pass; check_passed
    // asserts each generated query round-trips through the parser, the
    // intent class matches the planted expectation, and quality ∈ [0,1].
    "query_builder" -> Q.noOracle { (s, dir) =>
      import s.implicits._
      import graft.needleql.{QueryBuilder => QB}
      val profile = QB.profileOf(
        graft.core.Tables.load(s, dir, "embeddings"), "embeddings",
        "embedding", Seq("label" -> QB.FieldType.Num))
      // planted-intent accuracy floor: ALL eight classifications must
      // match (two per intent class), not just parse — a quantitative
      // 8/8 gate over the classifier, not a shape check
      val cases = Seq(
        ("find vectors about spark streaming", QB.Semantic),
        ("machine learning embedding tutorials", QB.Semantic),
        ("find items with score greater than 50", QB.Hybrid),
        ("show documents category technology with label greater than 3", QB.Hybrid),
        ("how many vectors are there", QB.Aggregation),
        ("count documents in the database", QB.Aggregation),
        ("category news", QB.MetadataOnly),
        ("type article", QB.MetadataOnly))
      cases.map { case (nl, expected) =>
        val r = QB.build(profile, nl)
        (nl, r.analysis.queryClass, r.analysis.complexity, r.needleql,
          math.rint(r.qualityScore * 1e6) / 1e6,
          r.optimizationHints.size, r.suggestions.size,
          r.parsed.isDefined && r.analysis.queryClass == expected &&
            r.qualityScore >= 0.0 && r.qualityScore <= 1.0)
      }.toDF("nl", "query_class", "complexity", "needleql", "quality",
        "n_hints", "n_suggestions", "check_passed")
    },

    // Pinned twin of query_builder (the cf_recommend_fixed pattern): the
    // collection profile is frozen to literals (2M vectors, one
    // unindexed high-cardinality Num field, default index config), so
    // the whole NL → intent → NeedleQL → hints/quality/suggestions
    // pipeline is deterministic and the oracle replays the exact result
    // set — full row/schema/hash gate, where the profile-derived twin
    // above can only self-check.
    "query_builder_fixed" -> Q(
      """SELECT * FROM (VALUES
        |  ('find vectors about spark streaming', 'semantic', 'simple',
        |   'SELECT * FROM embeddings WHERE vector SIMILAR TO $query LIMIT 10',
        |   CAST(0.9 AS DOUBLE), CAST(4 AS BIGINT), CAST(2 AS BIGINT)),
        |  ('machine learning embedding tutorials', 'semantic', 'simple',
        |   'SELECT * FROM embeddings WHERE vector SIMILAR TO $query LIMIT 10',
        |   CAST(0.9 AS DOUBLE), CAST(4 AS BIGINT), CAST(2 AS BIGINT)),
        |  ('find items with score greater than 50', 'hybrid', 'moderate',
        |   'SELECT * FROM embeddings WHERE vector SIMILAR TO $query LIMIT 20',
        |   CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('show documents category technology with label greater than 3',
        |   'hybrid', 'moderate',
        |   'SELECT * FROM embeddings WHERE vector SIMILAR TO $query LIMIT 20',
        |   CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('how many vectors are there', 'aggregation', 'moderate',
        |   'SELECT * FROM embeddings LIMIT 20',
        |   CAST(0.9 AS DOUBLE), CAST(2 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('count documents in the database', 'aggregation', 'moderate',
        |   'SELECT * FROM embeddings LIMIT 20',
        |   CAST(0.9 AS DOUBLE), CAST(2 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('category news', 'metadata_only', 'simple',
        |   'SELECT * FROM embeddings LIMIT 10',
        |   CAST(1.0 AS DOUBLE), CAST(2 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('type article', 'metadata_only', 'simple',
        |   'SELECT * FROM embeddings LIMIT 10',
        |   CAST(1.0 AS DOUBLE), CAST(2 AS BIGINT), CAST(0 AS BIGINT))
        |) AS t(nl, query_class, complexity, needleql, quality,
        |       n_hints, n_suggestions)
        |ORDER BY nl""".stripMargin
    ) { (s, _) =>
      import s.implicits._
      import graft.needleql.{QueryBuilder => QB}
      val profile = QB.CollectionProfile("embeddings", dimensions = 64,
        vectorCount = 2000000L,
        metadataFields = Seq(QB.FieldProfile("label", QB.FieldType.Num,
          cardinality = 5000L, indexed = false,
          sampleValues = Seq("1", "2", "3"))))
      val cases = Seq(
        "find vectors about spark streaming",
        "machine learning embedding tutorials",
        "find items with score greater than 50",
        "show documents category technology with label greater than 3",
        "how many vectors are there",
        "count documents in the database",
        "category news",
        "type article")
      cases.map { nl =>
        val r = QB.build(profile, nl)
        (nl, r.analysis.queryClass, r.analysis.complexity, r.needleql,
          math.rint(r.qualityScore * 1e6) / 1e6,
          r.optimizationHints.size.toLong, r.suggestions.size.toLong)
      }.toDF("nl", "query_class", "complexity", "needleql", "quality",
        "n_hints", "n_suggestions").orderBy(col("nl"))
    },
  )
}
