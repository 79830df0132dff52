package graft.pipeline

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document-quality scoring — the fastText-style classifier
  * step of the published GPT-3/CCNet pipeline (train a linear model on
  * hashed token features against a small labeled seed, then score the
  * whole corpus), complementing the rule sets ([[TextAnalysis.gopherFlags]],
  * [[TextAnalysis.c4Flags]]) with a learned filter.
  *
  * Spark-native shape: MLlib `HashingTF` + `LogisticRegression` — the fit
  * runs on the (small, by definition) labeled seed; scoring is one narrow
  * model.transform over the corpus, no shuffle, so the expensive side
  * scales to 100 TB as a scan. Tokenization reuses the engine's single-pass
  * tokenizer so classifier features match the BM25/text-analysis view of a
  * document.
  */
object QualityClassifier {

  final case class Config(numFeatures: Int = 1 << 18,
                          regParam: Double = 1e-3,
                          maxIter: Int = 50)

  private def featurize(df: DataFrame, textCol: Column, cfg: Config): DataFrame = {
    val toks = df.withColumn("__toks",
      graft.text.Tokenizer.tokens(textCol, stemming = false))
    new HashingTF().setInputCol("__toks").setOutputCol("__features")
      .setNumFeatures(cfg.numFeatures)
      .transform(toks)
  }

  /** Fit on labeled seed rows (`labelCol` ∈ {0.0, 1.0}). */
  def train(seed: DataFrame, textCol: Column, labelCol: Column,
            cfg: Config = Config()): LogisticRegressionModel = {
    val feats = featurize(seed.withColumn("__label", labelCol.cast("double")),
      textCol, cfg)
    new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setRegParam(cfg.regParam).setMaxIter(cfg.maxIter)
      .fit(feats)
  }

  /** Score a corpus: adds `quality_prob` (P(label=1)) and `quality_pred`
    * (0/1 at 0.5). */
  def score(model: LogisticRegressionModel, corpus: DataFrame,
            textCol: Column, cfg: Config = Config()): DataFrame = {
    model.setFeaturesCol("__features")
      .setProbabilityCol("__prob").setPredictionCol("__pred")
      .setRawPredictionCol("__raw")
      .transform(featurize(corpus, textCol, cfg))
      // native expressions, not a per-row scala UDF — this runs on every
      // corpus row, the one place serde-per-row would tax a 100 TB scan
      // (ml.functions.vector_to_array is itself a scala UDF, so unwrap_udt
      // → VectorUDT's dense `values` array is the native route; LR
      // probability vectors are always dense)
      .withColumn("quality_prob",
        element_at(unwrap_udt(col("__prob")).getField("values"), 2))
      .withColumn("quality_pred", col("__pred").cast("long"))
      .drop("__toks", "__features", "__prob", "__pred", "__raw")
  }

  /** Score a corpus with a PINNED linear model over an explicit term
    * vocabulary: `z = intercept + Σ w_i · tf_i` where `tf_i` is the count
    * of `vocab(i)` in the document's token stream (engine tokenizer,
    * stemming off). The margin, probability, and 0/1 prediction mirror
    * [[score]]'s surface, but every input to the decision is exact
    * arithmetic — integer counts against literal weights folded in vocab
    * order — so the result is reproducible in any engine (the
    * `quality_classifier_fixed` oracle replays it in SQL).
    *
    * Shuffle-free: tokenization is one compiled pass and the whole-vocab
    * tf vector is one narrow UDF pass over the per-row token array, so
    * scoring scales to a 100 TB corpus as a scan, like [[score]].
    */
  def scorePinned(corpus: DataFrame, textCol: Column, vocab: Seq[String],
                  weights: Seq[Double], intercept: Double): DataFrame = {
    require(vocab.length == weights.length,
      s"vocab(${vocab.length}) and weights(${weights.length}) must align")
    val toks = graft.text.Tokenizer.tokens(textCol, stemming = false)
    // ONE tf pass for the whole vocabulary: a per-term HOF filter would
    // re-evaluate the tokenizer and walk the token array once per vocab
    // entry (the repo's documented 100×-slower shape); materializing the
    // tf vector as its own column makes the fold read attribute lookups.
    // A term listed twice in the vocab counts at EVERY one of its indices
    // (matching the SQL replay, where each w_i multiplies tf(term_i)).
    val idx: Map[String, Seq[Int]] =
      vocab.zipWithIndex.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    val nVocab = vocab.length
    val tfU = udf { (ts: Seq[String]) =>
      // Tokenizer.tokens yields null for null text; propagate null like
      // the trained path (and the old per-term filter form) instead of
      // NPE-ing the task
      if (ts == null) null
      else {
        val out = new Array[Double](nVocab)
        ts.foreach(t => idx.getOrElse(t, Nil).foreach(i => out(i) += 1.0))
        out
      }
    }
    // left-fold in vocab order: the same association order as the SQL
    // replay's `intercept + w1*tf1 + w2*tf2 + …`, so z is bit-identical
    // (counts are exact small integers either way)
    val z = weights.zipWithIndex.foldLeft(lit(intercept): Column) {
      case (acc, (w, i)) => acc + lit(w) * col("__qc_tf")(i)
    }
    corpus.withColumn("__qc_tf", tfU(toks))
      .withColumn("quality_margin", z)
      .drop("__qc_tf")
      .withColumn("quality_prob",
        lit(1.0) / (lit(1.0) + exp(-col("quality_margin"))))
      // threshold on the sign of the exact margin, not the probability —
      // no libm call participates in the decision
      .withColumn("quality_pred",
        (col("quality_margin") > 0).cast("long"))
  }

  /** The xxhash64(id) mod 1000 cutoff below which a seed row lands in the
    * holdout — exposed so callers reconstructing the split (e.g. to score
    * exactly the holdout) derive it from the same constant.
    */
  def holdoutBucketCutoff(holdoutFrac: Double = 0.2): Int =
    (holdoutFrac * 1000).toInt

  def holdoutBucket(idCol: Column): Column =
    pmod(xxhash64(idCol.cast("string")), lit(1000))

  /** Train/holdout evaluation in one call: deterministic hash split,
    * returns (model, holdout accuracy — 0.0 when the hash split leaves the
    * holdout empty, rather than a null-unboxing NPE on degenerate seeds).
    */
  def trainEval(seed: DataFrame, textCol: Column, labelCol: Column,
                idCol: Column, holdoutFrac: Double = 0.2,
                cfg: Config = Config()): (LogisticRegressionModel, Double) = {
    val cutoff = holdoutBucketCutoff(holdoutFrac)
    val bucket = holdoutBucket(idCol)
    val train = seed.filter(bucket >= cutoff)
    val test = seed.filter(bucket < cutoff)
    val model = this.train(train, textCol, labelCol, cfg)
    val scored = score(model, test.withColumn("__label", labelCol.cast("double")),
      textCol, cfg)
    val agg = scored.agg(
      coalesce(avg(when(col("quality_pred") === col("__label").cast("long"), 1.0)
        .otherwise(0.0)), lit(0.0)).as("acc")).collect()(0)
    (model, agg.getAs[Double]("acc"))
  }
}
