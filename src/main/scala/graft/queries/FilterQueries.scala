package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.filter.{Filter, FilterCompiler}
import graft.functions.Distances

/** Declared queries exercising the metadata-filter language (SURVEY.md §2.2)
  * end-to-end: MongoDB-JSON parse → [[Filter]] ADT → Column compile →
  * pushed-down scan. Each has a hand-written ANSI-SQL oracle with identical
  * semantics.
  */
object FilterQueries {

  private def filtered(table: String, filterJson: String) =
    (s: org.apache.spark.sql.SparkSession, dir: String) => {
      val df = Tables.load(s, dir, table)
      df.filter(FilterCompiler.compile(Filter.parse(filterJson), df))
    }

  val defs: Map[String, Q] = Map(
    // $in + $between + $and over typed columns. `$between` is INCLUSIVE on
    // both ends (reference: src/metadata.rs:1301-1312), and the natural
    // sf* corpora hold no row exactly AT the lo bound (and only one lucky
    // row at the hi bound), which left a `>=`→`>` mutation invisible to
    // this gate (r16 audit finding). Rows are therefore PLANTED at value
    // == 10 and == 100 identically on both sides, so both boundary
    // comparisons are falsifiable regardless of the generated data.
    "filter_in_between" -> Q(
      """WITH corpus AS (
        |  SELECT event_id, event_type, value FROM events
        |  UNION ALL
        |  SELECT event_id + 100000, 'click', 10.0 FROM events WHERE event_id < 2
        |  UNION ALL
        |  SELECT event_id + 100010, 'purchase', 100.0 FROM events WHERE event_id < 2)
        |SELECT event_id, event_type, value FROM corpus
        |WHERE event_type IN ('click', 'purchase') AND value BETWEEN 10 AND 100
        |ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val planted = ev
        .unionAll(ev.filter(col("event_id") < 2)
          .withColumn("event_id", col("event_id") + 100000)
          .withColumn("event_type", lit("click"))
          .withColumn("value", lit(10.0)))
        .unionAll(ev.filter(col("event_id") < 2)
          .withColumn("event_id", col("event_id") + 100010)
          .withColumn("event_type", lit("purchase"))
          .withColumn("value", lit(100.0)))
      planted.filter(FilterCompiler.compile(Filter.parse(
        """{"$and": [{"event_type": {"$in": ["click", "purchase"]}},
          |          {"value": {"$between": [10, 100]}}]}""".stripMargin),
        planted))
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    },

    // Natural-language filter expression → NlFilterParser → Filter ADT →
    // the same compiled predicate path as every JSON filter (reference:
    // src/services/search/nl_filter_parser.rs). Exercises alias
    // resolution ("length"→"n_chars"), Gte ("at least"), Eq, Ne.
    "nl_filter_parse" -> Q(
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang = 'en' AND n_chars >= 200 AND source <> 'src3'
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val parsed = graft.filter.NlFilterParser()
        .addAlias("length", "n_chars")
        .parse("lang is 'en' and length at least 200 and source is not 'src3'")
      val df = Tables.load(s, dir, "documents")
      df.filter(FilterCompiler.compile(parsed.filter.get, df))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Dot-path descent into a JSON-string column (dynamic metadata model).
    "filter_json_path" -> Q(
      """SELECT event_type, count(*) AS n
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      filtered("events", """{"props.k": {"$gt": 50}}""")(s, dir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // $contains / $startsWith / $ne under $or + $and.
    "filter_string_ops" -> Q(
      """SELECT doc_id, lang, source FROM documents
        |WHERE (text LIKE '%spark%' OR source LIKE 'src1%') AND lang <> 'en'
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      filtered("documents",
        """{"$and": [{"$or": [{"text": {"$contains": "spark"}},
          |                   {"source": {"$startsWith": "src1"}}]},
          |          {"lang": {"$ne": "en"}}]}""".stripMargin)(s, dir)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },

    // Simplified-regex dialect: anchored exact-length match, `.` = any char
    // (reference: src/metadata.rs:1339-1394) — `^src1.$` ≡ LIKE 'src1_'.
    "filter_regex" -> Q(
      """SELECT source, count(*) AS n FROM documents
        |WHERE source LIKE 'src1_'
        |GROUP BY source ORDER BY source""".stripMargin
    ) { (s, dir) =>
      filtered("documents", """{"source": {"$regex": "^src1.$"}}""")(s, dir)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .orderBy(col("source"))
    },

    // $not over a compound inner filter (false-on-missing semantics).
    // The third conjunct is NOT over a MISSING field: the inner condition
    // resolves to null, false-on-missing makes it false, so the NOT keeps
    // every row — vacuous in the oracle SQL, but it pins the null-collapse
    // in the compiler (r18 audit: without a null-capable inner condition,
    // dropping the coalesce — NOT(null)=null drops all rows — was
    // unobservable).
    "filter_not" -> Q(
      """SELECT event_id, event_type FROM events
        |WHERE NOT (event_type = 'error' OR value < 50) AND user_id <= 5
        |ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      filtered("events",
        """{"$and": [{"$not": {"$or": [{"event_type": "error"},
          |                            {"value": {"$lt": 50}}]}},
          |          {"user_id": {"$lte": 5}},
          |          {"$not": {"no_such_field": {"$gt": 0}}}]}""".stripMargin)(s, dir)
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id"))
    },

    // count(filter) (reference: src/collection/accessors.rs:118).
    "count_filtered" -> Q(
      "SELECT count(*) AS n FROM events WHERE value > 100"
    ) { (s, dir) =>
      filtered("events", """{"value": {"$gt": 100}}""")(s, dir)
        .agg(count(lit(1)).as("n"))
    },

    // search_with_filter: metadata filter + exact kNN in one plan
    // (reference: src/collection/search_methods.rs:601-664). The filter is
    // pushed below the distance computation by Catalyst.
    "knn_filtered" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        |       round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |FROM embeddings, q
        |WHERE label IN (1, 2, 3)
        |ORDER BY distance, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val pred = FilterCompiler.compile(
        Filter.parse("""{"label": {"$in": [1, 2, 3]}}"""), emb)
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      emb.filter(pred).crossJoin(broadcast(qv))
        .select(col("vec_id"), col("label"),
          round(Distances.cosine(col("embedding"), col("qv")), 6).as("distance"))
        .orderBy(col("distance").asc, col("vec_id").asc)
        .limit(10)
    },
  )
}
