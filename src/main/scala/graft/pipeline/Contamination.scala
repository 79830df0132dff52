package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag training documents that share a
  * verbatim word n-gram with a held-out evaluation set (the public
  * GPT-3/PaLM decontamination recipe — n=8..13 word overlap).
  *
  * Scale design: the BENCHMARK side is small (eval sets are thousands of
  * docs), so its distinct n-gram set is broadcast; the 100 TB corpus side
  * explodes its n-grams and hash-joins against the broadcast set — a
  * map-side semi-join with no corpus-wide shuffle on a hot key. The only
  * aggregation is keyed by doc_id (per-doc bounded).
  */
object Contamination {

  /** Distinct word n-grams per row, only for docs with ≥ n words (shorter
    * docs have no full n-gram — a whole-doc fallback shingle would flag
    * short-doc exact matches, which exact dedup owns). One compiled UDF
    * pass (`Dedup.shinglesStrict`).
    */
  private def grams(textCol: Column, n: Int): Column =
    array_distinct(Dedup.shinglesStrict(textCol, n))

  /** The benchmark's distinct n-gram set — derived index state: build (and
    * persist) once per eval set, reuse across every corpus scan.
    */
  def benchmarkGrams(benchmark: DataFrame, benchTextCol: Column,
                     n: Int = 8): DataFrame =
    benchmark.select(explode(grams(benchTextCol, n)).as("gram")).distinct()

  /** (doc_id, n_shared) against a prebuilt [[benchmarkGrams]] set. */
  def flagAgainst(corpus: DataFrame, idCol: Column, textCol: Column,
                  benchGrams: DataFrame, n: Int): DataFrame =
    corpus.select(idCol.as("doc_id"), explode(grams(textCol, n)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // grams are pre-distinct per doc

  /** (doc_id, n_shared): corpus documents sharing ≥1 n-gram with the
    * benchmark, with the count of distinct shared n-grams.
    */
  def flag(corpus: DataFrame, idCol: Column, textCol: Column,
           benchmark: DataFrame, benchTextCol: Column,
           n: Int = 8): DataFrame =
    flagAgainst(corpus, idCol, textCol,
      benchmarkGrams(benchmark, benchTextCol, n), n)

  /** Decontaminated corpus: drop every flagged document (left anti join on
    * the bounded flag set).
    */
  def clean(corpus: DataFrame, idCol: Column, textCol: Column,
            benchmark: DataFrame, benchTextCol: Column,
            n: Int = 8): DataFrame = {
    val flagged = flag(corpus, idCol, textCol, benchmark, benchTextCol, n)
    corpus.join(flagged.select(col("doc_id").as("__flagged_id")),
        idCol === col("__flagged_id"), "left_anti")
  }

  /** FUZZY decontamination: corpus documents whose MinHash-estimated
    * Jaccard against any benchmark document clears `threshold` — the
    * near-duplicate form of eval leakage that verbatim n-gram overlap
    * misses (paraphrased or lightly-edited benchmark copies). Same
    * banding scheme as [[Dedup.minhashLsh]], but the band join is
    * CROSS-SET (corpus × benchmark), so the candidate count is bounded
    * by benchmark-bucket collisions, never corpus×corpus. Returns
    * (doc_id, bench_id, est_jaccard) — a doc may pair with several
    * benchmark rows; callers dropping contaminated docs anti-join on
    * doc_id.
    *
    * 100 TB shape: the benchmark side is eval-set-sized, so its band
    * keys broadcast; the corpus side streams one signature pass + a
    * map-side band join — no corpus shuffle beyond the per-doc groupBy.
    */
  def flagFuzzy(corpus: DataFrame, idCol: Column, textCol: Column,
                benchmark: DataFrame, benchIdCol: Column,
                benchTextCol: Column, n: Int = 3, k: Int = 64,
                bands: Int = 16, threshold: Double = 0.5,
                seed: Long = 42L): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    def sigs(df: DataFrame, id: Column, text: Column, name: String) =
      df.select(id.as(name),
        Dedup.minhashSignature(Dedup.shingles(text, n), k, seed).as(s"sig_$name"))
    def bandKeys(s: DataFrame, name: String) =
      s.select(col(name), posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col(s"sig_$name"), b * lit(r) + lit(1), lit(r)), b)))))
        .toDF(name, "band", "bucket")
    val cs = sigs(corpus, idCol, textCol, "doc_id").persist()
    val bs = sigs(benchmark, benchIdCol, benchTextCol, "bench_id").persist()
    val cand = bandKeys(cs, "doc_id")
      .join(broadcast(bandKeys(bs, "bench_id")), Seq("band", "bucket"))
      .select(col("doc_id"), col("bench_id")).distinct()
    cand
      .join(cs, "doc_id").join(broadcast(bs), "bench_id")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_doc_id"), col("sig_bench_id"),
          (x, y) => x === y), x => x)).cast("double") / k)
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_id"), col("bench_id"),
        round(col("est_jaccard"), 6).as("est_jaccard"))
  }
}
