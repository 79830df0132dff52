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
}
