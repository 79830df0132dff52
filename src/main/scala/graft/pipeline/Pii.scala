package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-corpus preparation — the
  * scrub step every published pretraining pipeline runs (the C4/CCNet/
  * Dolma recipe: regex families for emails, phone numbers, IP addresses,
  * masked with typed placeholder tokens so span statistics survive).
  *
  * Pure narrow column expressions: per-row regexp work with no shuffle,
  * streams over 100 TB at scan speed. The patterns are deliberately
  * conservative (high precision over recall) and kept to the regex subset
  * with identical semantics in Java and DuckDB's RE2, so the operator is
  * oracle-checkable end to end.
  */
object Pii {

  /** (name, pattern, replacement token). Order matters: emails first so an
    * address is not half-eaten by the phone pattern's digit runs.
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "|||EMAIL|||"),
    ("phone", "(?:\\+?[0-9]{1,3}[- .]?)?\\(?[0-9]{3}\\)?[- .]?[0-9]{3}[- .]?[0-9]{4}", "|||PHONE|||"),
    ("ip", "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "|||IP|||"),
    ("url", "https?://[^\\s]+", "|||URL|||"))

  /** Per-document counts of each PII family (detection pass — run this
    * before deciding to redact or drop).
    */
  def detect(text: Column): Seq[(String, Column)] =
    patterns.map { case (name, re, _) =>
      s"n_$name" -> size(regexp_extract_all(text, lit(re), lit(0))).cast("long")
    }

  /** Redacted text: every match replaced by its typed placeholder, applied
    * in declaration order.
    */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (acc, (_, re, token)) =>
      regexp_replace(acc, re, token)
    }

  /** Documents whose PII density exceeds `maxPerDoc` in any family are
    * dropped rather than redacted (a page of addresses is a directory, not
    * prose — the Dolma rule).
    */
  def dropDense(text: Column, maxPerDoc: Int = 5): Column = {
    val over = detect(text).map { case (_, c) => when(c > maxPerDoc, 1).otherwise(0) }
    over.reduce(_ + _) === 0
  }
}
