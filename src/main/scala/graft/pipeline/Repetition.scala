package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals (the Gopher/MassiveText recipe, public
  * data-pipeline practice): heavily repetitive documents — boilerplate,
  * keyword stuffing, templated spam — are low-quality training data and are
  * filtered on (a) the fraction of duplicate words and (b) the fraction of
  * the document covered by its single most frequent n-gram.
  *
  * Scale: dup-word fraction is a pure narrow expression; top-n-gram fraction
  * is explode → two groupBys KEYED BY doc_id — per-doc bounded fan-out, no
  * corpus-wide hot key, so both stream at 100 TB.
  */
object Repetition {

  /** Lowercased whitespace words, empties dropped — the shared tokenization
    * of the dedup/repetition family (`Dedup.shingles` applies the same).
    */
  def words(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), w => length(w) > 0)

  /** Fraction of words that are repeats of an earlier word:
    * `1 - distinct/total` (0 for empty docs).
    */
  def dupWordFraction(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, 0.0)
      .otherwise(lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws))
  }

  /** Per-document repetition signals over docs with at least 2 words:
    * (id, n_words, dup_word_frac, top_bigram_frac) where top_bigram_frac is
    * the most frequent bigram's share of all bigram slots.
    */
  def signals(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val base = df.select(idCol.as("id"), textCol.as("__text"))
      .filter(size(words(col("__text"))) >= 2)
    val perDoc = base.select(col("id"),
      size(words(col("__text"))).cast("long").as("n_words"),
      round(dupWordFraction(col("__text")), 6).as("dup_word_frac"))
    val top = base
      .select(col("id"), explode(Dedup.shingles(col("__text"), 2)).as("bigram"))
      .groupBy(col("id"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(round(max(col("c")).cast("double") / sum(col("c")), 6)
        .as("top_bigram_frac"))
    perDoc.join(top, "id")
  }
}
