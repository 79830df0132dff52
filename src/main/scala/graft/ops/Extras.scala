package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining operator surface (SURVEY.md §2): search explain reports,
  * ensemble reranking, adaptive-fusion query classification, field stats,
  * provenance records.
  */
object Extras {

  // ----------------------------------------------------------- explain

  /** Search explain report (reference: src/collection/search.rs:160-210 —
    * SearchExplain; surfaced by search_explain / search_with_trace,
    * src/collection/search_methods.rs:311-421). The Spark analogue couples
    * the result with wall time and the executed plan.
    */
  final case class SearchExplain(
      results: Array[org.apache.spark.sql.Row],
      totalTimeMs: Double,
      vectorsScanned: Long,
      resultCount: Int,
      physicalPlan: String)

  def searchExplain(df: DataFrame, scanned: => Long = -1L): SearchExplain = {
    val t0 = System.nanoTime()
    val rows = df.collect()
    val ms = (System.nanoTime() - t0) / 1e6
    SearchExplain(rows, ms, scanned, rows.length,
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
  }

  // ---------------------------------------------------- ensemble reranker

  /** Ensemble reranker (reference: src/search/reranker.rs:469-556):
    * weighted RRF over member rerankers' ranked lists. Each member is a
    * (ranked DataFrame with `id` and descending-better `score`, weight).
    */
  def ensembleRerank(members: Seq[(DataFrame, Double)], k: Int,
                     rrfK: Double = 60.0): DataFrame = {
    val ranked = members.zipWithIndex.map { case ((df, w), i) =>
      graft.internal.Guards.requireKBounded(df, s"ensembleRerank(member $i)")
      df.select(col("id"),
        (lit(w) / (lit(rrfK) + row_number().over(
          Window.orderBy(col("score").desc, col("id").asc))))
          .as(s"__c$i"))
    }
    ranked.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
      .withColumn("rrf_score",
        members.indices.map(i => coalesce(col(s"__c$i"), lit(0.0)))
          .reduce(_ + _))
      .select(col("id"), col("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id").asc)
      .limit(k)
  }

  // ------------------------------------------- adaptive fusion (rule-based)

  /** Query-type features (reference: src/hybrid.rs:626-770). */
  final case class QueryFeatures(isQuestion: Boolean, hasQuotes: Boolean,
                                 hasSpecialChars: Boolean)

  private val questionWords = Set("who", "what", "when", "where", "why",
    "how", "which", "whose", "whom", "is", "are", "can", "does", "do")

  def extractFeatures(query: String): QueryFeatures = {
    val firstWord = query.trim.split("\\s+").headOption.map(_.toLowerCase(java.util.Locale.ROOT))
    QueryFeatures(
      isQuestion = firstWord.exists(questionWords.contains) ||
        query.trim.endsWith("?"),
      hasQuotes = query.contains('"') || query.contains('\''),
      hasSpecialChars = query.exists(c =>
        !c.isLetterOrDigit && !c.isWhitespace && c != '\'' && c != '"' && c != '?'))
  }

  sealed trait QueryType
  object QueryType {
    case object Keyword extends QueryType
    case object Semantic extends QueryType
    case object Mixed extends QueryType
  }

  /** Rule-based classification → fusion weights (reference classify +
    * presets: hybrid.rs:712, :109-126). Questions read semantic; quoted
    * phrases and code-ish tokens read keyword; both → mixed.
    */
  def classify(f: QueryFeatures): QueryType =
    if (f.isQuestion) QueryType.Semantic
    else if (f.hasQuotes) QueryType.Keyword
    else if (f.hasSpecialChars) QueryType.Mixed
    else QueryType.Semantic

  def weightsFor(t: QueryType): graft.text.Rrf.Config = t match {
    case QueryType.Semantic => graft.text.Rrf.Config.semantic
    case QueryType.Keyword  => graft.text.Rrf.Config.keyword
    case QueryType.Mixed    => graft.text.Rrf.Config.default
  }

  // -------------------------------------------------------------- field stats

  /** Field statistics (reference: src/metadata.rs:606-640): per-column
    * cardinality (exact + approximate) and null counts. The
    * high-cardinality index-suppression threshold (10 000, metadata.rs:189)
    * is reported as a flag — columnar stats make the suppression itself
    * moot (SURVEY.md §4.1).
    */
  def fieldStats(df: DataFrame, fields: Seq[String],
                 cardinalityThreshold: Long = 10000L): DataFrame = {
    val rows = fields.map { f =>
      df.agg(
        countDistinct(col(f)).as("cardinality"),
        approx_count_distinct(col(f)).as("approx_cardinality"),
        sum(when(col(f).isNull, 1L).otherwise(0L)).as("nulls"),
        count(lit(1)).as("total"))
        .withColumn("field", lit(f))
        .withColumn("high_cardinality", col("cardinality") > cardinalityThreshold)
    }
    rows.reduce(_ unionByName _)
      .select(col("field"), col("cardinality"), col("approx_cardinality"),
        col("nulls"), col("total"), col("high_cardinality"))
  }

  // ----------------------------------------------------------- skew salting

  /** Skew-salted inner equi-join: replicate the (small-ish) right side
    * `salt` ways and scatter left rows across replicas, so one hot key
    * spreads over `salt` reducers instead of stalling a single task — the
    * manual complement to AQE's skew-join handling for first-shuffle skew
    * (AQE only splits post-shuffle partitions).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int): DataFrame = {
    val l = left.withColumn("__salt",
      (rand(42) * salt).cast("int")) // deterministic seed
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  // -------------------------------------------------------------- provenance

  /** Provenance record column (reference: src/collection/insert.rs:446-460):
    * (source, created_at, version, parent_ids) struct attached per row.
    */
  def withProvenance(df: DataFrame, source: String, createdAt: Long,
                     version: String = "1",
                     parentIdsCol: Option[Column] = None): DataFrame =
    df.withColumn("provenance", struct(
      lit(source).as("source"),
      lit(createdAt).as("created_at"),
      lit(version).as("version"),
      parentIdsCol.getOrElse(array().cast("array<string>")).as("parent_ids")))
}
