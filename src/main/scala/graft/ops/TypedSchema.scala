package graft.ops

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed metadata schemas + secondary-index semantics (reference:
  * src/services/collection/typed_schema.rs): per-collection field
  * definitions (6 types, required/default), strict vs open validation,
  * default filling, and the equality/range lookups the reference backs
  * with in-memory HashMap/BTreeMap secondary indexes.
  *
  * Spark re-expression: validation and default-filling are NARROW
  * per-row passes over the JSON metadata column (one compiled pass
  * each, ingest-side — never in the scoring hot path). The reference's
  * secondary indexes disappear as a data structure: `lookupEq` /
  * `lookupRange` compile to predicates on the metadata path, which
  * Catalyst pushes into the parquet scan — min/max row-group statistics
  * and dictionary filters ARE the secondary index at 100 TB, with no
  * index maintenance on write. `indexStats` recovers the reference's
  * per-field entry/distinct counts as one grouped aggregation.
  */
object TypedSchema {

  sealed trait FieldType { def name: String }
  object FieldType {
    case object Str extends FieldType { val name = "string" }
    case object IntT extends FieldType { val name = "int" }
    case object FloatT extends FieldType { val name = "float" }
    case object BoolT extends FieldType { val name = "bool" }
    case object StrArray extends FieldType { val name = "string_array" }
    case object IntArray extends FieldType { val name = "int_array" }
  }

  final case class FieldDef(name: String, fieldType: FieldType,
                            required: Boolean,
                            default: Option[String] = None,
                            description: Option[String] = None) {
    /** `default` is the JSON text of the default value. */
    def withDefault(json: String): FieldDef = copy(default = Some(json))
    def withDescription(d: String): FieldDef = copy(description = Some(d))
  }

  final case class SchemaDefinition(collection: String,
                                    fields: Vector[FieldDef] = Vector.empty,
                                    indexed: Vector[String] = Vector.empty,
                                    allowExtraFields: Boolean = true) {
    def field(name: String, t: FieldType, required: Boolean): SchemaDefinition =
      copy(fields = fields :+ FieldDef(name, t, required))
    def fieldWithDefault(name: String, t: FieldType,
                         defaultJson: String): SchemaDefinition =
      copy(fields = fields :+
        FieldDef(name, t, required = false, Some(defaultJson)))
    def indexedOn(name: String): SchemaDefinition =
      copy(indexed = indexed :+ name)
    def strict: SchemaDefinition = copy(allowExtraFields = false)
  }

  /** (field, kind) — kind ∈ {missing_required, type_mismatch,
    * unknown_field}; messages are presentation, the pair is the
    * contract (and the oracle-hashable surface).
    */
  final case class ValidationError(field: String, kind: String) {
    def message: String = kind match {
      case "missing_required" => s"Required field '$field' is missing"
      case "type_mismatch" => s"Field '$field' has the wrong type"
      case _ => s"Unknown field '$field' (strict mode)"
    }
  }

  private def typeMatches(t: FieldType, v: JsonNode): Boolean = t match {
    case FieldType.Str => v.isTextual
    // typed_schema.rs type_matches: Int accepts integral numbers only,
    // Float accepts any number
    case FieldType.IntT => v.isIntegralNumber
    case FieldType.FloatT => v.isNumber
    case FieldType.BoolT => v.isBoolean
    case FieldType.StrArray =>
      v.isArray && v.elements().asScala.forall(_.isTextual)
    case FieldType.IntArray =>
      v.isArray && v.elements().asScala.forall(_.isIntegralNumber)
  }

  private implicit class IterConv[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters
      .IteratorHasAsScala(it).asScala
  }

  /** Reference validate() (typed_schema.rs:365-416) over one metadata
    * JSON document: required fields (absent AND defaultless → error),
    * declared-field type checks, unknown fields in strict mode. Order:
    * required errors in schema order, then per-key errors in document
    * order — matching the reference's two loops.
    */
  // one mapper per JVM (ObjectMapper is thread-safe for reads and
  // heavyweight to build — never per row)
  @transient private lazy val mapper = new ObjectMapper()

  def validateOne(schema: SchemaDefinition,
                  metadataJson: String): Seq[ValidationError] = {
    val node = try mapper.readTree(
        if (metadataJson == null || metadataJson.isEmpty) "null"
        else metadataJson)
      catch { case _: Exception => return Seq(
        ValidationError("$", "type_mismatch")) }
    val obj = Option(node).filter(_.isObject)
    val errors = mutable.Buffer.empty[ValidationError]
    schema.fields.foreach { f =>
      if (f.required && !obj.exists(_.has(f.name)) && f.default.isEmpty)
        errors += ValidationError(f.name, "missing_required")
    }
    obj.foreach { o =>
      scala.jdk.CollectionConverters.SetHasAsScala(o.properties())
        .asScala.foreach { e =>
        schema.fields.find(_.name == e.getKey) match {
          case Some(f) =>
            if (!typeMatches(f.fieldType, e.getValue))
              errors += ValidationError(e.getKey, "type_mismatch")
          case None =>
            if (!schema.allowExtraFields)
              errors += ValidationError(e.getKey, "unknown_field")
        }
      }
    }
    errors.toSeq
  }

  /** Column of `array<struct<field:string, kind:string>>` validation
    * errors for a JSON metadata column — one narrow pass, ingest-side.
    */
  def validateColumn(schema: SchemaDefinition, metadataCol: Column): Column = {
    val u = udf { (json: String) =>
      validateOne(schema, json).map(e => (e.field, e.kind))
    }
    u(metadataCol).cast("array<struct<field:string,kind:string>>")
  }

  /** Per-row validation over a collection: (id, field, kind) — one row
    * per error; valid rows drop out.
    */
  def validate(df: DataFrame, idCol: Column, metadataCol: Column,
               schema: SchemaDefinition): DataFrame =
    df.select(idCol.as("id"),
        explode(validateColumn(schema, metadataCol)).as("e"))
      .select(col("id"), col("e.field").as("field"), col("e.kind").as("kind"))

  /** apply_defaults (typed_schema.rs:497-517): missing declared fields
    * with defaults are filled into the JSON document; present fields
    * are untouched. One narrow pass.
    */
  def applyDefaults(schema: SchemaDefinition, metadataCol: Column): Column = {
    val defaults = schema.fields.collect {
      case f if f.default.isDefined => f.name -> f.default.get
    }
    val u = udf { (json: String) =>
      val node = try mapper.readTree(
          if (json == null || json.isEmpty) "{}" else json)
        catch { case _: Exception => mapper.createObjectNode() }
      val obj =
        if (node.isObject)
          node.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        else mapper.createObjectNode()
      defaults.foreach { case (name, dj) =>
        if (!obj.has(name)) {
          obj.set[JsonNode](name, mapper.readTree(dj))
          ()
        }
      }
      mapper.writeValueAsString(obj)
    }
    u(metadataCol)
  }

  /** lookup_eq (typed_schema.rs:446-460) as a pushed predicate: the
    * parquet scan's row-group statistics and dictionary pages play the
    * reference's HashMap index.
    */
  def lookupEq(df: DataFrame, fieldCol: Column, value: Any): DataFrame =
    df.filter(fieldCol === lit(value))

  /** lookup_range (typed_schema.rs:462-477), min/max inclusive like the
    * reference's BTreeMap range.
    */
  def lookupRange(df: DataFrame, fieldCol: Column, min: Double,
                  max: Double): DataFrame =
    df.filter(fieldCol >= min && fieldCol <= max)

  /** index_stats (typed_schema.rs:479-495): per indexed field, non-null
    * entry count + distinct values — one aggregation per call covering
    * ALL fields (grouping sets over field name), not one scan per field.
    */
  def indexStats(df: DataFrame, fields: Map[String, Column]): DataFrame = {
    val perField = fields.toSeq.map { case (name, c) =>
      df.agg(
        count(c).as("entry_count"),
        countDistinct(c).as("distinct_values"))
        .select(lit(name).as("field_name"), col("entry_count"),
          col("distinct_values"))
    }
    perField.reduce(_ unionByName _)
  }
}
