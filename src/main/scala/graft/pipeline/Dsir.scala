package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * select raw-corpus documents that look like a target domain by
  * importance weights over HASHED n-gram features. The production trick
  * is the hashing: bucketing uni+bigrams into a fixed feature space
  * (default 8192) bounds the model at any corpus size — the bucket
  * count table is O(B) whatever the vocabulary, which is what lets the
  * estimator run over 100 TB (the same reason the paper uses it for
  * The Pile).
  *
  * Model: bag-of-buckets with add-one smoothing on both distributions,
  * `w(doc) = (1/n) Σ_f [ln p_target(b(f)) − ln p_raw(b(f))]` over the
  * doc's feature instances (mean keeps long docs comparable). Selection
  * here is deterministic top-n by weight — the paper's Gumbel-top-k
  * reduces to exactly this when the noise is off, and a seeded
  * perturbation can ride on top without changing the estimator.
  *
  * Spark shape: one tokenize pass (uni + lag-window bigrams), one
  * `pmod(xxhash64(feature), B)` bucket projection (codegen'd, no UDF),
  * TWO bounded aggregates (the O(B) bucket table; the per-doc mean),
  * and a broadcast-sized join of features to the bucket table. No
  * corpus-sized shuffle except the per-doc groupBy on the natural key.
  */
object Dsir {

  /** Hashed uni+bigram feature instances: (__doc_id, bucket). Bigrams
    * pair via a per-doc lag window (same stream the bigram LM uses —
    * Perplexity.tokenStream); hashing is Spark's xxhash64 (seed 42)
    * which the DuckDB oracle replays exactly (XxHash64Sql).
    */
  def featureStream(docs: DataFrame, idCol: Column, textCol: Column,
                    buckets: Int = 8192): DataFrame = {
    val toks = Perplexity.tokenStream(docs, idCol, textCol)
    val w = Window.partitionBy(col("__doc_id")).orderBy(col("pos"))
    val bigrams = toks
      .withColumn("__prev", lag(col("term"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("__doc_id"),
        concat(col("__prev"), lit(" "), col("term")).as("term"))
    toks.select(col("__doc_id"), col("term")).unionByName(bigrams)
      .select(col("__doc_id"),
        pmod(xxhash64(col("term")), lit(buckets.toLong)).as("bucket"))
  }

  /** Importance-weight documents against a target subset of the same
    * corpus (`targetPred` marks the target rows — e.g. a language or a
    * curated source). Returns (doc_id, n_feats, weight); docs with no
    * features weight null.
    */
  def score(docs: DataFrame, idCol: Column, textCol: Column,
            targetPred: Column, buckets: Int = 8192): DataFrame = {
    val flagged = docs.withColumn("__tgt", targetPred)
    val feats = featureStream(flagged, idCol, textCol, buckets)
      .join(flagged.select(idCol.as("__doc_id"), col("__tgt")), Seq("__doc_id"))
    val bucketCounts = feats.groupBy(col("bucket")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
    val totals = bucketCounts.agg(sum(col("cr")), sum(col("ct"))).collect()(0)
    val nr = totals.getLong(0); val nt = totals.getLong(1)
    val lr = bucketCounts.select(col("bucket"),
      (log((col("ct") + lit(1L)).cast("double") / lit(nt + buckets.toDouble)) -
        log((col("cr") + lit(1L)).cast("double") / lit(nr + buckets.toDouble)))
        .as("logr"))
    val scored = feats.join(lr, Seq("bucket"))
      .groupBy(col("__doc_id"))
      .agg(count(lit(1)).as("n_feats"), avg(col("logr")).as("weight"))
    docs.select(idCol.as("__doc_id")).distinct()
      .join(scored, Seq("__doc_id"), "left")
      .select(col("__doc_id").as("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"), col("weight"))
  }

  /** Deterministic DSIR selection: the n highest-weight documents,
    * ties (at 6-decimal weight, the oracle contract) broken by doc id.
    */
  def selectTop(scored: DataFrame, n: Int): DataFrame =
    scored.filter(col("weight").isNotNull)
      .withColumn("weight", round(col("weight"), 6))
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(n)
}
