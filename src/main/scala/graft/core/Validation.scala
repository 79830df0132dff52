package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Insert-time vector validation (SURVEY.md §1.1; reference:
  * src/collection/validation.rs via src/collection/insert.rs:36): a vector
  * must have exactly `dims` elements, no nulls, and no NaN/Inf values.
  * Expressed as a Column predicate so validation rides the scan (batch) or
  * the micro-batch (streaming) with no extra pass.
  */
object Validation {

  def isValidVector(vec: Column, dims: Int): Column =
    vec.isNotNull &&
      size(vec) === dims &&
      !exists(vec, x => x.isNull || isnan(x) ||
        abs(x) === lit(Float.PositiveInfinity))

  /** Split a batch into (valid, rejected) — the batch analogue of the
    * reference's per-insert error.
    */
  def partition(df: DataFrame, vecCol: Column,
                dims: Int): (DataFrame, DataFrame) = {
    val ok = isValidVector(vecCol, dims)
    (df.filter(ok), df.filter(!coalesce(ok, lit(false))))
  }

  /** Strict mode: throw on the first invalid vector (per-insert parity). */
  def requireValid(df: DataFrame, vecCol: Column, dims: Int): DataFrame = {
    val bad = df.filter(!coalesce(isValidVector(vecCol, dims), lit(false))).count()
    if (bad > 0) throw new IllegalArgumentException(
      s"$bad vector(s) failed validation (dims=$dims, NaN/Inf/null rejected)")
    df
  }
}
