package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 over DataFrames (SURVEY.md §2.4; reference:
  * src/hybrid.rs:349-416).
  *
  *   score(D,Q) = Σ_t qc(t) · IDF(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))
  *   IDF(t)     = ln((N − df + 0.5)/(df + 0.5) + 1)
  *
  * with defaults k1=1.5, b=0.75 (reference: src/hybrid.rs:26-34). Duplicate
  * query terms contribute once per occurrence (the reference loops over the
  * tokenized query), hence the qc(t) multiplicity factor.
  *
  * Scale shape: the corpus statistics are three derived tables —
  * `term_freqs(doc_id, term, tf, dl)`, `doc_freqs(term, df)` and a 1-row
  * `(N, avgdl)` — all computed by partial-aggregating scans. Scoring a query
  * touches only the posting rows of the query's terms (a broadcast semi-join
  * on a handful of terms), then one groupBy over candidate docs: no shuffle
  * is proportional to corpus size except the one-time stats build, exactly
  * how a 100 TB corpus must be handled. Stats are deterministic, so they can
  * be persisted as bucketed tables and refreshed incrementally per
  * micro-batch (reference: src/hybrid.rs:270-330 recomputes avgdl per change;
  * our batch build recomputes once, like its `batch_index_documents`).
  */
object Bm25 {

  final case class Config(
      k1: Double = 1.5,
      b: Double = 0.75,
      stopWords: Set[String] = Tokenizer.defaultStopWords,
      stemming: Boolean = true)

  /** The derived statistics tables (cache/persist for reuse). */
  final case class Index(
      termFreqs: DataFrame, // doc_id, term, tf, dl
      docFreqs: DataFrame,  // term, df
      corpus: DataFrame,    // n, avgdl (1 row)
      config: Config,
      docLens: DataFrame) { // doc_id, dl (incl. zero-token docs)
    /** Pin the stats tables in memory — an index is a reused structure
      * (the reference maintains it across queries); without this every
      * search re-tokenizes the corpus.
      */
    def persisted(): Index = {
      termFreqs.persist(); docFreqs.persist(); corpus.persist(); docLens.persist()
      this
    }

    /** Release the pinned stats tables (superseded index eviction). */
    def unpersist(): Unit = {
      termFreqs.unpersist(); docFreqs.unpersist(); corpus.unpersist()
      docLens.unpersist()
    }
  }

  /** Build the statistics tables for a document corpus. */
  def index(docs: DataFrame, idCol: Column, textCol: Column,
            config: Config = Config()): Index = {
    val toks = docs.select(
      idCol.as("doc_id"),
      Tokenizer.tokens(textCol, config.stopWords, config.stemming).as("toks"))
    // Zero-token docs still count toward N and avgdl (reference indexes them
    // with length 0), so dl is computed before the explode.
    val withLen = toks.select(col("doc_id"), col("toks"),
      size(col("toks")).cast("double").as("dl"))
    val tf = withLen
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val corpus = withLen.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    Index(tf, df_, corpus, config, withLen.select(col("doc_id"), col("dl")))
  }

  /** Incremental maintenance (reference: src/hybrid.rs:270-330 index/remove
    * + :433-477 batch variant): only the NEW documents are tokenized; the
    * doc_freqs and corpus stats tables are re-derived from the merged
    * term_freqs/doc_lens — a groupBy over postings, not a re-scan of the
    * old corpus text. Same-id docs are replaced (the reference removes the
    * old posting set first).
    */
  def addDocuments(ix: Index, docs: DataFrame, idCol: Column,
                   textCol: Column): Index = {
    val fresh = index(docs, idCol, textCol, ix.config)
    val keptTf = ix.termFreqs.join(fresh.docLens.select("doc_id"),
      Seq("doc_id"), "left_anti")
    val keptLens = ix.docLens.join(fresh.docLens.select("doc_id"),
      Seq("doc_id"), "left_anti")
    rebuild(ix, keptTf.unionByName(fresh.termFreqs),
      keptLens.unionByName(fresh.docLens))
  }

  /** Remove documents by id (reference: remove_document). */
  def removeDocuments(ix: Index, ids: DataFrame): Index = {
    val drop = ids.toDF("doc_id")
    rebuild(ix,
      ix.termFreqs.join(drop, Seq("doc_id"), "left_anti"),
      ix.docLens.join(drop, Seq("doc_id"), "left_anti"))
  }

  private def rebuild(ix: Index, tf: DataFrame, lens: DataFrame): Index =
    Index(tf,
      tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df")),
      lens.agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl")),
      ix.config, lens)

  /** Score a free-text query; returns (doc_id, score) with score > 0, sorted
    * descending (ties broken by doc_id for determinism; the reference's
    * unstable sort has no distributed analogue).
    */
  def search(ix: Index, query: String, limit: Int): DataFrame = {
    val terms = Tokenizer.tokenize(query, ix.config.stopWords, ix.config.stemming)
    if (terms.isEmpty) return ix.termFreqs.sparkSession.emptyDataFrame
      .select(lit(null).cast("long").as("doc_id"), lit(0.0).as("score"))
    scoreTerms(ix, terms)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(limit)
  }

  /** The scoring join for an already-tokenized query (no ordering/limit). */
  def scoreTerms(ix: Index, terms: Seq[String]): DataFrame = {
    // (no SparkSession needed: the query side is pure literals)
    // query-term counts ride as a LITERAL map (queries are tiny by
    // definition) — an `isin` filter + map lookup instead of two
    // broadcast-join legs saves two broadcast-collect jobs per query
    val qCounts: Map[String, Double] =
      terms.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    if (qCounts.isEmpty)
      return ix.termFreqs.select(col("doc_id"), lit(0.0).as("score"))
        .filter(lit(false))
    val distinctTerms = qCounts.keys.toSeq
    val k1 = ix.config.k1
    val b = ix.config.b
    // Query-side stats ride as LITERALS, not join legs: docFreqs pruned to
    // the query's terms (≤ |query| rows — the full table is corpus-
    // vocabulary-sized) plus the 1-row corpus table, collected in ONE small
    // job. The previous two-broadcast-leg formulation (join(broadcast(qdf))
    // + crossJoin(broadcast(corpus))) paid two broadcast-exchange jobs and
    // three AQE stages per query — ~1 s of pure scheduling at any data
    // size. With per-term `qc·idf` weights folded into a literal map the
    // postings side is filter → map lookup → one hash aggregate: a single
    // shuffle, and the same double-op order as before (qc·idf first), so
    // scores are bit-identical.
    val stats = ix.docFreqs.filter(col("term").isin(distinctTerms: _*))
      .crossJoin(ix.corpus).collect()
    if (stats.isEmpty)
      return ix.termFreqs.select(col("doc_id"), lit(0.0).as("score"))
        .filter(lit(false))
    val n = stats.head.getAs[Double]("n")
    val avgdl = stats.head.getAs[Double]("avgdl")
    val weights: Map[String, Double] = stats.map { r =>
      val term = r.getAs[String]("term")
      val df = r.getAs[Double]("df")
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      term -> qCounts(term) * idf
    }.toMap
    ix.termFreqs
      .filter(col("term").isin(weights.keys.toSeq: _*))
      .withColumn("lennorm", lit(1.0) - b + lit(b) * col("dl") / lit(avgdl))
      .withColumn("contrib",
        element_at(typedLit(weights), col("term")) * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * col("lennorm")))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score"))
  }
}
