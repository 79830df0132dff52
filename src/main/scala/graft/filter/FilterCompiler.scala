package graft.filter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles the [[Filter]] ADT to a Spark `Column` predicate — the single
  * most load-bearing component of the engine (SURVEY.md §2.2): every search,
  * count, delete and NeedleQL WHERE goes through it.
  *
  * Semantics mirror the reference evaluator (reference:
  * src/metadata.rs:1196-1416) exactly:
  *   - missing field ⇒ condition is false, except `$exists: false`;
  *   - numeric comparisons are f64-only — non-numeric operands ⇒ false;
  *   - `$nin` of a non-array filter value ⇒ true; `$in` ⇒ false;
  *   - `$contains` is substring on strings, membership on arrays;
  *   - `$regex` is the reference's simplified dialect (anchors + `.` +
  *     leading/trailing `.*` — NOT full regex), translated structurally at
  *     compile time (src/metadata.rs:1339-1394);
  *   - dot-paths traverse structs and array indices
  *     (src/metadata.rs:1223-1241).
  *
  * Because the predicate is a plain Catalyst expression tree, Spark pushes
  * the compiled filter into the parquet scan (PushedFilters / row-group
  * skipping) — the distributed replacement for the reference's per-field
  * bloom filters and inverted indexes (SURVEY.md §4.1), with zero custom
  * code.
  *
  * Fields whose path descends *into* a JSON-string column (e.g. an events
  * `props` column holding `{"k": 87}`) are resolved with `get_json_object`,
  * and the comparison type is inferred from the filter literal — matching
  * the reference's dynamic-JSON metadata model.
  */
object FilterCompiler {

  /** A resolved field: the column plus its static type when known. */
  final case class Resolved(col: Column, dataType: Option[DataType])

  def compile(f: Filter, df: DataFrame): Column =
    compile(f, schemaResolver(df.schema) _)

  def compile(f: Filter, resolve: String => Resolved): Column = f match {
    // empty And = match-everything, empty Or = match-nothing (the reference's
    // Filter::And(vec![]) pass-through, used for SIMILAR TO placeholders)
    case Filter.And(fs) => fs.map(compile(_, resolve))
      .reduceLeftOption(_ && _).getOrElse(lit(true))
    case Filter.Or(fs)  => fs.map(compile(_, resolve))
      .reduceLeftOption(_ || _).getOrElse(lit(false))
    case Filter.Not(g)  =>
      // Spark's three-valued NOT(null)=null would drop rows the reference
      // keeps: needle's NOT is boolean over a false-on-missing inner result.
      // This is the ONLY place that needs null-collapsing: bare conditions
      // may evaluate to null, but null is falsy at the filter boundary and
      // propagates through AND/OR exactly like false — while a coalesce
      // around every condition would block parquet predicate pushdown
      // (DataSourceStrategy cannot translate coalesce(pred, false)).
      !coalesce(compile(g, resolve), lit(false))
    case Filter.Condition(field, op, value) =>
      condition(resolve(field), op, value)
  }

  /** Resolve a dot-path against a static schema. Struct fields and array
    * indices are traversed natively; descending into a StringType column is
    * treated as JSON-path access (`get_json_object`), whose result type is
    * unknown until compared.
    */
  def schemaResolver(schema: StructType)(path: String): Resolved = {
    val parts = path.split('.')
    def walk(c: Column, dt: DataType, rest: List[String]): Resolved = rest match {
      case Nil => Resolved(c, Some(dt))
      case p :: tail => dt match {
        case st: StructType =>
          st.fields.find(_.name == p) match {
            case Some(f) => walk(c.getField(p), f.dataType, tail)
            case None    => Resolved(lit(null), None) // missing ⇒ false
          }
        case ArrayType(et, _) if p.forall(_.isDigit) =>
          walk(c.getItem(p.toInt), et, tail)
        case StringType => // JSON-string column: remaining path via JSON
          Resolved(get_json_object(c, "$." + rest.mkString(".")), None)
        case _ => Resolved(lit(null), None)
      }
    }
    schema.fields.find(_.name == parts.head) match {
      case Some(f) => walk(col(parts.head), f.dataType, parts.toList.tail)
      case None if parts.length > 1 =>
        // No such root column; try a literal dotted column name.
        Resolved(col(path), None)
      case None => Resolved(lit(null), None)
    }
  }

  private def condition(r: Resolved, op: FilterOp, v: JValue): Column = {
    import FilterOp._
    val c = r.col
    op match {
      case Eq  => eqCol(r, v)
      case Ne  => !eqCol(r, v) && c.isNotNull
      case Gt  => numCmp(r, v, _ > _)
      case Gte => numCmp(r, v, _ >= _)
      case Lt  => numCmp(r, v, _ < _)
      case Lte => numCmp(r, v, _ <= _)
      case In => v match {
        case JArr(vs) => membership(r, vs)
        case _        => lit(false)
      }
      case NotIn => v match {
        // Reference: !arr.contains(x) — but missing field still ⇒ false.
        case JArr(vs) => !membership(r, vs) && c.isNotNull
        case _        => c.isNotNull // non-array ⇒ true for present fields
      }
      case Contains => (r.dataType, v) match {
        case (Some(ArrayType(et, _)), _) =>
          if (elementCompatible(et, v)) array_contains(c, literal(v, Some(et)))
          else lit(false) // class mismatch: membership is false, not a cast
        case (Some(StringType) | None, JStr(s)) => asString(r).contains(s)
        case _ => lit(false)
      }
      case StartsWith => v match {
        case JStr(s) => asString(r).startsWith(s)
        case _       => lit(false)
      }
      case EndsWith => v match {
        case JStr(s) => asString(r).endsWith(s)
        case _       => lit(false)
      }
      case Exists => v match {
        case JBool(false) => c.isNull
        case _            => c.isNotNull
      }
      case Regex => v match {
        case JStr(p) => simpleRegex(asString(r), p)
        case _       => lit(false)
      }
      case All => (r.dataType, v) match {
        case (Some(ArrayType(et, _)), JArr(vs)) =>
          vs.map(x =>
            if (elementCompatible(et, x)) array_contains(c, literal(x, Some(et)))
            else lit(false))
            .foldLeft(lit(true))(_ && _)
        case _ => lit(false)
      }
      case ElemMatch => (r.dataType, v) match {
        case (Some(ArrayType(et, _)), _) =>
          val sub = Filter.parse(v)
          exists(c, e => compile(sub, elementResolver(e, et) _))
        case _ => lit(false)
      }
      case Between => v match {
        case JArr(Vector(lo, hi)) =>
          numCmp(r, lo, _ >= _) && numCmp(r, hi, _ <= _)
        case _ => lit(false)
      }
      case Size => v match {
        case JNum(n) if n >= 0 && n.isWhole => r.dataType match {
          case Some(ArrayType(_, _))        => size(c) === n.toInt
          case Some(StringType) | None      => length(asString(r)) === n.toInt
          case _                            => lit(false)
        }
        case _ => lit(false)
      }
      case Type => v match {
        case JStr(name) => typeCheck(r, name)
        case _          => lit(false)
      }
    }
  }

  /** Field-type-aware equality; arrays/objects compare structurally.
    * Reference Eq is structural JSON equality (metadata.rs:979): a number
    * NEVER equals a string — statically mismatched classes compile to
    * `false` rather than a coercing comparison, which under ANSI mode
    * would hard-fail the query on the first non-castable row.
    */
  private def eqCol(r: Resolved, v: JValue): Column = (v, r.dataType) match {
    case (JNull, _)    => r.col.isNull // JSON null equality
    case (JArr(vs), Some(ArrayType(_, _))) => r.col === arrayLiteral(vs, elementHint(r))
    case (JNum(d), None)  => asDouble(r) === d   // JSON-extracted: numeric compare
    case (JBool(b), None) => asString(r) === b.toString
    case (JNum(d), Some(t)) => t match {
      // f64 compare, never a truncating cast of the literal (Eq(intCol,
      // 1.5) must not become intCol === 1)
      case _: NumericType => asDouble(r) === d
      case _              => lit(false)
    }
    case (JStr(s), Some(t)) => t match {
      case StringType => r.col === s
      case _          => lit(false)
    }
    case (JBool(b), Some(t)) => t match {
      case BooleanType => r.col === b
      case _           => lit(false)
    }
    case (JArr(_), Some(_)) => lit(false) // array literal vs non-array field
    case (_, _)        => r.col === literal(v, r.dataType)
  }

  private def membership(r: Resolved, vs: Vector[JValue]): Column =
    vs.map(eqCol(r, _)).foldLeft(lit(false))(_ || _)

  /** Numeric comparison in f64; non-numeric operand ⇒ false (null). */
  private def numCmp(r: Resolved, v: JValue, f: (Column, Column) => Column): Column =
    v match {
      case JNum(d) => r.dataType match {
        case Some(_: NumericType) | None => f(asDouble(r), lit(d))
        case _                           => lit(false)
      }
      case _ => lit(false)
    }

  private def asDouble(r: Resolved): Column = r.dataType match {
    case Some(DoubleType)     => r.col
    case Some(_: NumericType) => r.col.cast(DoubleType) // widening, never fails
    // dynamic JSON text: non-numeric values must become null (false at the
    // filter boundary), not an ANSI cast error killing the whole scan
    case _                    => r.col.try_cast(DoubleType)
  }

  private def asString(r: Resolved): Column = r.dataType match {
    case Some(StringType) | None => r.col.cast(StringType)
    case _                       => lit(null).cast(StringType)
  }

  private def elementHint(r: Resolved): Option[DataType] = r.dataType match {
    case Some(ArrayType(et, _)) => Some(et)
    case _                      => None
  }

  /** Whether a filter literal's JSON class can legally equal an element of
    * the given static type — mismatches are structural-inequality `false`
    * (never a coercing cast, which ANSI mode turns into a runtime error).
    */
  private def elementCompatible(et: DataType, v: JValue): Boolean = (et, v) match {
    case (_: NumericType, JNum(_)) => true
    case (StringType, JStr(_))     => true
    case (BooleanType, JBool(_))   => true
    case (_, JNull)                => true
    case _                         => false
  }

  /** Resolver for `$elemMatch` lambda elements (struct or scalar). */
  private def elementResolver(e: Column, et: DataType)(path: String): Resolved =
    et match {
      case st: StructType =>
        val parts = path.split('.').toList
        def walk(c: Column, dt: DataType, rest: List[String]): Resolved = rest match {
          case Nil => Resolved(c, Some(dt))
          case p :: tail => dt match {
            case s: StructType => s.fields.find(_.name == p) match {
              case Some(f) => walk(c.getField(p), f.dataType, tail)
              case None    => Resolved(lit(null), None)
            }
            case _ => Resolved(lit(null), None)
          }
        }
        walk(e, st, parts) match {
          case Resolved(c, dt) if parts.nonEmpty => Resolved(c, dt)
          case r => r
        }
      case _ => Resolved(lit(null), None)
    }

  /** JValue → Column literal, coerced toward the field's type when known. */
  private def literal(v: JValue, hint: Option[DataType]): Column = v match {
    case JNull    => lit(null)
    case JBool(b) => lit(b)
    case JNum(d) => hint match {
      case Some(t @ (ByteType | ShortType | IntegerType | LongType)) => lit(d.toLong).cast(t)
      case Some(FloatType)       => lit(d.toFloat)
      case Some(t: NumericType)  => lit(d).cast(t)
      case _                     => lit(d)
    }
    case JStr(s)  => lit(s)
    case JArr(vs) => arrayLiteral(vs, hint.collect { case ArrayType(et, _) => et })
    case JObj(_)  => throw new IllegalArgumentException(
      "Object literals are only valid under $elemMatch / bare-Eq on structs")
  }

  private def arrayLiteral(vs: Vector[JValue], elemHint: Option[DataType]): Column =
    array(vs.map(literal(_, elemHint)): _*)

  /** Structural translation of the reference's simplified regex
    * (src/metadata.rs:1339-1394): anchors stripped, leading/trailing `.*`
    * become contains/endsWith/startsWith, remaining pattern is an exact
    * same-length match where `.` is a single-char wildcard.
    */
  def simpleRegex(c: Column, pattern0: String): Column = {
    if (pattern0.isEmpty) return c === ""
    if (pattern0 == ".*" || pattern0 == "^.*$") return c.isNotNull

    var p = pattern0
    if (p.startsWith("^")) p = p.substring(1)
    if (p.endsWith("$")) p = p.substring(0, p.length - 1)
    val prefixWild = p.startsWith(".*")
    if (prefixWild) p = p.substring(2)
    val suffixWild = p.endsWith(".*")
    if (suffixWild) p = p.substring(0, p.length - 2)

    if (prefixWild && suffixWild) c.contains(p)
    else if (prefixWild) c.endsWith(p)
    else if (suffixWild) c.startsWith(p)
    else {
      // Exact-length match with `.` as any-char: translate to an anchored
      // Java regex with every non-dot char quoted.
      val rx = p.map {
        case '.' => "."
        case ch  => java.util.regex.Pattern.quote(ch.toString)
      }.mkString
      length(c) === p.length && c.rlike("^" + rx + "$")
    }
  }

  /** `$type` check: statically decidable for typed columns; value-based
    * heuristic for JSON-extracted fields.
    */
  private def typeCheck(r: Resolved, name: String): Column = r.dataType match {
    case Some(dt) =>
      val matches = (name, dt) match {
        case ("string", StringType)        => true
        case ("number", _: NumericType)    => true
        case ("boolean", BooleanType)      => true
        case ("array", _: ArrayType)       => true
        case ("object", _: StructType)     => true
        case _                             => false
      }
      if (name == "null") r.col.isNull
      else if (matches) r.col.isNotNull
      else lit(false)
    case None => name match { // JSON-extracted string: sniff the value
      case "number"  => r.col.try_cast(DoubleType).isNotNull
      case "boolean" => r.col.isin("true", "false")
      case "string"  => r.col.isNotNull && r.col.try_cast(DoubleType).isNull &&
        !r.col.isin("true", "false")
      case "null"    => r.col.isNull
      case _         => lit(false)
    }
  }
}
