package graft

import org.apache.spark.sql.functions._

import graft.ops.TypedSchema
import graft.ops.TypedSchema._
import graft.ops.TypedSchema.FieldType._

/** Typed-schema service vs typed_schema.rs: validation semantics (the
  * reference's two-loop order, required-with-default exemption, strict
  * mode, integral-vs-float acceptance), default filling, and the
  * pushdown re-expression of the secondary-index lookups.
  */
class TypedSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val schema = SchemaDefinition("docs")
    .field("lang", Str, required = true)
    .field("n", IntT, required = true)
    .field("score", FloatT, required = false)
    .field("tags", StrArray, required = false)
    .strict

  test("validateOne: reference order — required errors first (schema " +
      "order), then per-key type/unknown errors (document order)") {
    assert(validateOne(schema, """{"lang":"en","n":3}""").isEmpty)
    // both required missing: schema order
    assert(validateOne(schema, """{}""").map(_.kind) ==
      Seq("missing_required", "missing_required"))
    assert(validateOne(schema, """{}""").map(_.field) == Seq("lang", "n"))
    // type mismatches: int field refuses doubles AND strings; float
    // accepts integral numbers (typed_schema.rs type_matches)
    assert(validateOne(schema, """{"lang":"en","n":3.5}""")
      .map(_.kind) == Seq("type_mismatch"))
    assert(validateOne(schema, """{"lang":"en","n":"3"}""")
      .map(_.kind) == Seq("type_mismatch"))
    assert(validateOne(schema, """{"lang":"en","n":3,"score":2}""").isEmpty)
    // arrays: element-wise typing
    assert(validateOne(schema,
      """{"lang":"en","n":1,"tags":["a","b"]}""").isEmpty)
    assert(validateOne(schema, """{"lang":"en","n":1,"tags":["a",2]}""")
      .map(_.field) == Seq("tags"))
    // strict mode flags unknown fields; open mode does not
    assert(validateOne(schema, """{"lang":"en","n":1,"x":1}""")
      == Seq(ValidationError("x", "unknown_field")))
    assert(validateOne(schema.copy(allowExtraFields = true),
      """{"lang":"en","n":1,"x":1}""").isEmpty)
    // a required field WITH a default is exempt from missing_required
    val withDefault = SchemaDefinition("d", fields = Vector(
      FieldDef("lang", Str, required = true, default = Some("\"en\""))))
    assert(validateOne(withDefault, """{}""").isEmpty)
    // non-object / unparseable documents
    assert(validateOne(schema, null).map(_.field) == Seq("lang", "n"))
    assert(validateOne(schema, "{not json").head.kind == "type_mismatch")
  }

  test("validate explodes per-error rows over a collection") {
    val df = Seq(
      (1L, """{"lang":"en","n":1}"""),
      (2L, """{"lang":"en"}"""),
      (3L, """{"lang":"en","n":"x","y":1}"""))
      .toDF("doc_id", "meta")
    val errs = TypedSchema.validate(df, col("doc_id"), col("meta"), schema)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(errs.toSet == Set(
      (2L, "n", "missing_required"),
      (3L, "n", "type_mismatch"), (3L, "y", "unknown_field")))
  }

  test("applyDefaults fills only missing declared fields") {
    val s = SchemaDefinition("d")
      .fieldWithDefault("quality", FloatT, "0.5")
      .fieldWithDefault("lang", Str, "\"und\"")
    val df = Seq((1L, """{"lang":"en"}"""), (2L, """{}"""),
      (3L, null: String)).toDF("id", "meta")
    val out = df.select(col("id"),
        TypedSchema.applyDefaults(s, col("meta")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == """{"lang":"en","quality":0.5}""")
    assert(out(2L) == """{"quality":0.5,"lang":"und"}""")
    assert(out(3L) == """{"quality":0.5,"lang":"und"}""")
  }

  test("lookupEq/lookupRange push to the scan; indexStats aggregates " +
      "entry and distinct counts") {
    val df = Seq((1L, "en", 10.0), (2L, "de", 20.0), (3L, "en", 30.0),
      (4L, null.asInstanceOf[String], 40.0)).toDF("id", "lang", "score")
    assert(TypedSchema.lookupEq(df, col("lang"), "en")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // inclusive bounds, like the reference's BTreeMap range
    assert(TypedSchema.lookupRange(df, col("score"), 20.0, 30.0)
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    val stats = TypedSchema.indexStats(df,
        Map("lang" -> col("lang"), "score" -> col("score")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(stats("lang") == ((3L, 2L))) // null not counted
    assert(stats("score") == ((4L, 4L)))
  }
}
