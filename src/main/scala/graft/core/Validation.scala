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

  // ------------------------------------------------- metadata schema

  /** Validate one metadata JSON value against the reference's JSON-Schema
    * subset (metadata.rs:69-110): `required` field names must be present;
    * `properties.<f>.type` constrains present fields to one of
    * string/number/boolean/array/object/null. Returns the first error
    * message, or None when valid. Single compiled pass per row via
    * [[metadataSchemaError]].
    */
  def validateMetadataJson(metadataJson: String, schemaJson: String): Option[String] = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val mapper = new ObjectMapper()
    def typeName(n: JsonNode): String =
      if (n.isNull) "null"
      else if (n.isBoolean) "boolean"
      else if (n.isNumber) "number"
      else if (n.isTextual) "string"
      else if (n.isArray) "array"
      else "object"
    val meta =
      try mapper.readTree(if (metadataJson == null) "null" else metadataJson)
      catch { case _: Exception => return Some("metadata is not valid JSON") }
    if (!meta.isObject) return Some("metadata must be a JSON object")
    val schema = mapper.readTree(schemaJson)
    val req = schema.path("required")
    if (req.isArray) {
      val it = req.elements()
      while (it.hasNext) {
        val f = it.next().asText()
        if (!meta.has(f)) return Some(s"missing required metadata field: '$f'")
      }
    }
    val props = schema.path("properties")
    if (props.isObject) {
      val names = props.properties().iterator()
      while (names.hasNext) {
        val e = names.next()
        val expected = e.getValue.path("type")
        if (expected.isTextual && meta.has(e.getKey)) {
          val actual = typeName(meta.get(e.getKey))
          if (actual != expected.asText())
            return Some(s"metadata field '${e.getKey}' expected type " +
              s"'${expected.asText()}', got '$actual'")
        }
      }
    }
    None
  }

  /** Column: error message per row, null when the metadata validates. */
  def metadataSchemaError(schemaJson: String)(metaCol: Column): Column = {
    val v = udf((m: String) => validateMetadataJson(m, schemaJson).orNull)
    v(metaCol)
  }

  /** Split a batch on schema validity — (valid, rejected-with-reason). */
  def partitionBySchema(df: DataFrame, metaCol: Column,
                        schemaJson: String): (DataFrame, DataFrame) = {
    val err = metadataSchemaError(schemaJson)(metaCol)
    (df.withColumn("__schema_err", err).filter(col("__schema_err").isNull)
      .drop("__schema_err"),
      df.withColumn("schema_error", err).filter(col("schema_error").isNotNull))
  }
}
