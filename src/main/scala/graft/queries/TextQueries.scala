package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Distances
import graft.text.{Bm25, Rrf, Tokenizer}

/** BM25 + RRF hybrid-search queries (SURVEY.md §2.4) over `documents`.
  *
  * Oracle parity: these entries run with `stemming = false` so DuckDB can
  * reproduce the token stream with pure SQL (lower → regex split → len>1 →
  * stop-word removal); the stemming leg of the pipeline is covered by the
  * PorterStemmer/Bm25 ScalaTest specs instead. Scores are rounded to 6
  * decimals on both sides, and all orderings use the rounded score with id
  * tie-breaks.
  */
object TextQueries {

  private val stopList = Tokenizer.defaultStopWords.toSeq.sorted
    .map(w => s"'$w'").mkString(", ")

  /** DuckDB replica of the reference tokenizer, minus stemming. */
  private def duckToks: String =
    s"""toks AS (
       |  SELECT doc_id, unnest(list_filter(
       |           string_split_regex(lower(text), '[^a-z0-9]+'),
       |           t -> len(t) > 1 AND t NOT IN ($stopList))) AS term
       |  FROM documents
       |)""".stripMargin

  /** DuckDB BM25 score CTEs for the given query terms (k1=1.5, b=0.75). */
  private def duckBm25(queryTermsSql: String): String =
    s"""$duckToks,
       |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term),
       |dl AS (SELECT d.doc_id, count(t.term)::DOUBLE AS dl
       |       FROM documents d LEFT JOIN toks t ON d.doc_id = t.doc_id GROUP BY d.doc_id),
       |corpus AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
       |qt AS (SELECT term, count(*)::DOUBLE AS qc FROM (SELECT unnest([$queryTermsSql]) AS term) GROUP BY term),
       |dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
       |bm25 AS (
       |  SELECT tf.doc_id,
       |         sum(qt.qc * ln((c.n - dfs.df + 0.5)/(dfs.df + 0.5) + 1)
       |             * tf.tf * 2.5 / (tf.tf + 1.5 * (1 - 0.75 + 0.75 * dl.dl / c.avgdl))) AS score
       |  FROM tf
       |  JOIN qt  ON tf.term = qt.term
       |  JOIN dfs ON tf.term = dfs.term
       |  JOIN dl  ON tf.doc_id = dl.doc_id
       |  CROSS JOIN corpus c
       |  GROUP BY tf.doc_id
       |)""".stripMargin

  private val query = "spark query batch"
  private val queryTermsSql = "'spark', 'query', 'batch'"

  val defs: Map[String, Q] = Map(
    // Okapi BM25 top-k (reference: src/hybrid.rs:349-416).
    "bm25_search" -> Q(
      s"""WITH ${duckBm25(queryTermsSql)}
         |SELECT doc_id, round(score, 6) AS score FROM bm25
         |WHERE round(score, 6) > 0
         |ORDER BY round(score, 6) DESC, doc_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val ix = graft.core.IndexCache.getOrBuild(s"bm25:$dir:nostem") {
        Bm25.index(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), Bm25.Config(stemming = false)).persisted()
      }
      Bm25.scoreTerms(ix, Tokenizer.tokenize(query, stemming = false))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .filter(col("score") > 0)
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
    },

    // Incremental index maintenance under the driver gate (reference:
    // src/hybrid.rs:270-330 / :433-477 batch variant): the index is built
    // on doc_id < 400 and the rest arrives through addDocuments — the
    // merged postings must score EXACTLY like the full-corpus oracle, so
    // the maintenance path itself is what's hash-gated (previously
    // ScalaTest-only).
    "bm25_incremental" -> Q(
      s"""WITH ${duckBm25(queryTermsSql)}
         |SELECT doc_id, round(score, 6) AS score FROM bm25
         |WHERE round(score, 6) > 0
         |ORDER BY round(score, 6) DESC, doc_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val ix = graft.core.IndexCache.getOrBuild(s"bm25inc:$dir:nostem") {
        val base = Bm25.index(d.filter(col("doc_id") < 400),
          col("doc_id"), col("text"), Bm25.Config(stemming = false))
        Bm25.addDocuments(base, d.filter(col("doc_id") >= 400),
          col("doc_id"), col("text")).persisted()
      }
      Bm25.scoreTerms(ix, Tokenizer.tokenize(query, stemming = false))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .filter(col("score") > 0)
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
    },

    // RRF hybrid fusion of a vector top-50 and a BM25 top-50
    // (reference: src/hybrid.rs:540-600; k=60, weights 0.5/0.5). documents
    // and embeddings share the 0..N-1 id space at correctness scale.
    "hybrid_rrf" -> Q(
      s"""WITH ${duckBm25(queryTermsSql)},
         |bmtop AS (
         |  SELECT doc_id, round(score, 6) AS score,
         |         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS bm25_rank
         |  FROM bm25 WHERE round(score, 6) > 0
         |  ORDER BY round(score, 6) DESC, doc_id LIMIT 50
         |),
         |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vtop AS (
         |  SELECT vec_id,
         |         round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance,
         |         row_number() OVER (
         |           ORDER BY round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6), vec_id) AS vector_rank
         |  FROM embeddings, qv
         |  ORDER BY distance, vec_id LIMIT 50
         |)
         |SELECT coalesce(v.vec_id, b.doc_id) AS id,
         |       round(coalesce(0.5 / (60 + v.vector_rank), 0)
         |           + coalesce(0.5 / (60 + b.bm25_rank), 0), 6) AS rrf_score
         |FROM vtop v FULL OUTER JOIN bmtop b ON v.vec_id = b.doc_id
         |ORDER BY rrf_score DESC, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val vtop = emb.crossJoin(broadcast(qv))
        .select(col("vec_id").as("id"),
          round(Distances.cosine(col("embedding"), col("qv")), 6).as("distance"))
        .orderBy(col("distance").asc, col("id").asc)
        .limit(50)
      val ix = graft.core.IndexCache.getOrBuild(s"bm25:$dir:nostem") {
        Bm25.index(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), Bm25.Config(stemming = false)).persisted()
      }
      val btop = Bm25.scoreTerms(ix, Tokenizer.tokenize(query, stemming = false))
        .select(col("doc_id").as("id"), round(col("score"), 6).as("score"))
        .filter(col("score") > 0)
        .orderBy(col("score").desc, col("id").asc)
        .limit(50)
      Rrf.fuse(vtop, btop, Rrf.Config.default, limit = 10)
        .select(col("id"), round(col("rrf_score"), 6).as("rrf_score"))
    },
  )
}
