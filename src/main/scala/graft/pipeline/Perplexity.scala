package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model perplexity scoring — the CCNet/GPT-3 pipeline's
  * LM-based quality filter (Wenzek et al. 2019 score documents with a
  * language-model perplexity and keep the low-perplexity head/middle of
  * the distribution; the production systems use a 5-gram KenLM, the
  * unigram model is the same computation with n = 1 and is exactly
  * SQL-replayable, which is what the oracle gate needs).
  *
  * Model: add-one-smoothed unigram probabilities over the corpus token
  * stream, `p(t) = (c(t) + 1) / (N + V)`; document score
  * `nll = (1/n) Σ −ln p(tᵢ)` (mean negative log-likelihood, nats) and
  * `ppl = exp(nll)`. Empty-token documents score null (no evidence).
  *
  * Spark shape, 100 TB posture:
  *   - the LM is ONE narrow groupBy over exploded tokens — vocabulary-
  *     bounded output (≪ corpus), the same scale class as the BM25 stats
  *     build;
  *   - scoring joins tokens to the vocab table on the token key. The
  *     planner broadcasts when the vocab fits (typical: ≤ a few million
  *     distinct tokens) and falls back to a shuffle equi-join when a
  *     pathological vocabulary does not — both are bounded, no row ever
  *     fans out;
  *   - per-document reduction is one groupBy(doc) avg — the only
  *     corpus-sized shuffle, keyed by the natural key.
  */
object Perplexity {

  /** Add-one-smoothed unigram log-probability table: (term, log_p).
    * Deterministic given the corpus; `stemming = false` keeps the token
    * stream SQL-reproducible (the oracle replays it).
    */
  def unigramLm(docs: DataFrame, textCol: Column): DataFrame = {
    val toks = docs.select(
      explode(graft.text.Tokenizer.tokens(textCol, stemming = false))
        .as("term"))
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).as("n"),
      count(lit(1)).as("v")).collect()(0)
    val n = totals.getLong(0); val v = totals.getLong(1)
    counts.select(col("term"),
      log((col("c") + lit(1L)).cast("double") / lit((n + v).toDouble))
        .as("log_p"))
  }

  /** Score documents against a unigram LM: adds `n_tokens`,
    * `nll` (mean −ln p, nats), `ppl` (= exp(nll)). Tokens absent from the
    * LM take the smoothed floor `unseenLogP` (callers scoring the LM's
    * own corpus never hit it; cross-corpus callers pass
    * `ln(1 / (N + V))`).
    */
  def score(docs: DataFrame, idCol: Column, textCol: Column,
            lm: DataFrame, unseenLogP: Double = Double.NaN): DataFrame = {
    val toks = docs.select(idCol.as("__doc_id"),
      explode(graft.text.Tokenizer.tokens(textCol, stemming = false))
        .as("term"))
    val floor =
      if (unseenLogP.isNaN) col("log_p") else coalesce(col("log_p"), lit(unseenLogP))
    val scored = toks.join(lm, Seq("term"), "left")
      .groupBy(col("__doc_id"))
      .agg(count(lit(1)).as("n_tokens"), avg(-floor).as("nll"))
    docs.select(idCol.as("__doc_id")).distinct()
      .join(scored, Seq("__doc_id"), "left")
      .select(col("__doc_id").as("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("nll"), exp(col("nll")).as("ppl"))
  }

  /** Ordered token stream (doc, pos, term) — the shared input of the
    * n-gram models; one compiled tokenize pass, no shuffle.
    */
  def tokenStream(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("__doc_id"),
      posexplode(graft.text.Tokenizer.tokens(textCol, stemming = false))
        .as(Seq("pos", "term")))

  /** Interpolated-bigram scoring, one step closer to CCNet's KenLM:
    * `p(tᵢ|tᵢ₋₁) = λ·c(tᵢ₋₁tᵢ)/c(tᵢ₋₁) + (1−λ)·p_uni(tᵢ)`; a document's
    * first token (no predecessor) scores with the unigram term alone.
    * The unigram interpolation floor means unseen bigrams never zero the
    * probability — the standard Jelinek-Mercer fallback.
    *
    * Scale shape: the bigram table is one groupBy over lag-paired tokens
    * (bounded by distinct bigrams, ≪ corpus at any natural-language
    * vocabulary); pairing is a lag window partitioned by document —
    * per-doc state, the same class as the chunking/windowed operators.
    */
  def scoreBigram(docs: DataFrame, idCol: Column, textCol: Column,
                  lambda: Double = 0.7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stream = tokenStream(docs, idCol, textCol)
    val paired = stream.withColumn("prev",
      lag(col("term"), 1).over(
        Window.partitionBy(col("__doc_id")).orderBy(col("pos"))))
    val uniC = stream.groupBy(col("term")).agg(count(lit(1)).as("c1"))
    val totals = uniC.agg(sum(col("c1")).as("n"),
      count(lit(1)).as("v")).collect()(0)
    val denom = (totals.getLong(0) + totals.getLong(1)).toDouble
    val uni = uniC.select(col("term"),
      ((col("c1") + lit(1L)).cast("double") / lit(denom)).as("p_uni"),
      col("c1"))
    val biC = paired.filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("term")).agg(count(lit(1)).as("c2"))
    val p = paired
      .join(uni.select(col("term"), col("p_uni")), Seq("term"))
      .join(uni.select(col("term").as("prev"), col("c1").as("c1_prev")),
        Seq("prev"), "left")
      .join(biC, Seq("prev", "term"), "left")
      .withColumn("p",
        when(col("prev").isNull, col("p_uni"))
          .otherwise(lit(lambda) *
            (coalesce(col("c2"), lit(0L)).cast("double") / col("c1_prev")) +
            lit(1.0 - lambda) * col("p_uni")))
    val scored = p.groupBy(col("__doc_id"))
      .agg(count(lit(1)).as("n_tokens"), avg(-log(col("p"))).as("nll"))
    docs.select(idCol.as("__doc_id")).distinct()
      .join(scored, Seq("__doc_id"), "left")
      .select(col("__doc_id").as("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("nll"), exp(col("nll")).as("ppl"))
  }

  /** The CCNet keep-rule: documents with perplexity at or below the given
    * quantile of the corpus distribution (the published pipeline keeps
    * the head/middle thirds; `q = 2.0/3` reproduces that cut).
    */
  def filterByQuantile(scored: DataFrame, q: Double): DataFrame = {
    require(q > 0 && q <= 1, s"quantile must be in (0, 1], got $q")
    val cut = scored.filter(col("ppl").isNotNull)
      .stat.approxQuantile("ppl", Array(q), 0.001)(0)
    scored.filter(col("ppl").isNotNull && col("ppl") <= cut)
  }
}
