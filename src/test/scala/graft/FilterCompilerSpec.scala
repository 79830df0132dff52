package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.filter.{Filter, FilterCompiler}

/** Behavior parity tests for the filter language against the reference
  * evaluator's documented semantics (reference: src/metadata.rs:1196-1416
  * and its inline tests src/metadata.rs:1419-2633).
  */
class FilterCompilerSpec extends SparkSpec {
  import spark.implicits._

  // Rows mimic needle's (id, metadata) shape with typed metadata columns,
  // an array column, a nested struct, and a raw-JSON string column.
  private lazy val df: DataFrame = Seq(
    (1L, "alice", 30.0, Seq("red", "blue"), ("NY", 10), """{"score": 5, "vip": true}"""),
    (2L, "bob", 25.0, Seq("green"), ("SF", 94), """{"score": 72}"""),
    (3L, "carol", 41.5, Seq.empty[String], ("LA", 90), """{}"""),
    (4L, null.asInstanceOf[String], 25.0, null.asInstanceOf[Seq[String]], null.asInstanceOf[(String, Int)], null.asInstanceOf[String]),
  ).toDF("id", "name", "age", "tags", "addr", "props")
    .withColumn("addr", col("addr").cast("struct<city:string,zip:int>"))

  private def ids(json: String): Seq[Long] =
    df.filter(FilterCompiler.compile(Filter.parse(json), df))
      .select("id").as[Long].collect().sorted.toSeq

  test("bare field = Eq shorthand") { assert(ids("""{"name": "alice"}""") == Seq(1L)) }

  test("$ne excludes missing fields (false-on-missing)") {
    assert(ids("""{"name": {"$ne": "alice"}}""") == Seq(2L, 3L))
  }

  test("numeric comparisons are f64") {
    assert(ids("""{"age": {"$gt": 25}}""") == Seq(1L, 3L))
    assert(ids("""{"age": {"$gte": 25, "$lt": 41.5}}""") == Seq(1L, 2L, 4L))
    assert(ids("""{"age": {"$between": [25, 30]}}""") == Seq(1L, 2L, 4L))
  }

  test("$in / $nin; $nin non-array is true for present fields") {
    assert(ids("""{"name": {"$in": ["alice", "bob"]}}""") == Seq(1L, 2L))
    assert(ids("""{"name": {"$nin": ["alice"]}}""") == Seq(2L, 3L))
    assert(ids("""{"name": {"$nin": "alice"}}""") == Seq(1L, 2L, 3L))
    assert(ids("""{"name": {"$in": "alice"}}""") == Seq())
  }

  test("$contains: substring on strings, membership on arrays") {
    assert(ids("""{"name": {"$contains": "li"}}""") == Seq(1L))
    assert(ids("""{"tags": {"$contains": "red"}}""") == Seq(1L))
  }

  test("$startsWith / $endsWith") {
    assert(ids("""{"name": {"$startsWith": "a"}}""") == Seq(1L))
    assert(ids("""{"name": {"$endsWith": "ol"}}""") == Seq(3L))
  }

  test("$exists true/false") {
    assert(ids("""{"name": {"$exists": true}}""") == Seq(1L, 2L, 3L))
    assert(ids("""{"name": {"$exists": false}}""") == Seq(4L))
  }

  test("$size on arrays and strings") {
    assert(ids("""{"tags": {"$size": 2}}""") == Seq(1L))
    assert(ids("""{"tags": {"$size": 0}}""") == Seq(3L))
    assert(ids("""{"name": {"$size": 3}}""") == Seq(2L))
  }

  test("$all") {
    assert(ids("""{"tags": {"$all": ["red", "blue"]}}""") == Seq(1L))
    assert(ids("""{"tags": {"$all": ["red", "black"]}}""") == Seq())
  }

  test("dot-path into struct") {
    assert(ids("""{"addr.city": "SF"}""") == Seq(2L))
    assert(ids("""{"addr.zip": {"$gte": 90}}""") == Seq(2L, 3L))
  }

  test("dot-path into JSON-string column") {
    assert(ids("""{"props.score": {"$gt": 50}}""") == Seq(2L))
    assert(ids("""{"props.score": {"$exists": true}}""") == Seq(1L, 2L))
    assert(ids("""{"props.vip": true}""") == Seq(1L))
  }

  test("missing field never matches (except $exists:false)") {
    assert(ids("""{"nosuch": {"$gt": 0}}""") == Seq())
    assert(ids("""{"nosuch": {"$exists": false}}""") == Seq(1L, 2L, 3L, 4L))
  }

  test("$and / $or / $not combinators") {
    assert(ids("""{"$or": [{"name": "alice"}, {"addr.city": "LA"}]}""") == Seq(1L, 3L))
    assert(ids("""{"$and": [{"age": {"$gte": 25}}, {"name": {"$exists": true}}]}""") == Seq(1L, 2L, 3L))
    // NOT over false-on-missing: row 4 (name missing) => inner false => NOT true
    assert(ids("""{"$not": {"name": "alice"}}""") == Seq(2L, 3L, 4L))
  }

  test("simplified regex dialect") {
    assert(ids("""{"name": {"$regex": "^a.*"}}""") == Seq(1L))    // startsWith
    assert(ids("""{"name": {"$regex": ".*ob$"}}""") == Seq(2L))    // endsWith
    assert(ids("""{"name": {"$regex": ".*aro.*"}}""") == Seq(3L))  // contains
    assert(ids("""{"name": {"$regex": "b.b"}}""") == Seq(2L))      // exact-len + any-char
    assert(ids("""{"name": {"$regex": "alice"}}""") == Seq(1L))    // exact
    assert(ids("""{"name": {"$regex": "ali"}}""") == Seq())        // length mismatch
    assert(ids("""{"name": {"$regex": ".*"}}""") == Seq(1L, 2L, 3L)) // matches any present
  }

  test("$type") {
    assert(ids("""{"name": {"$type": "string"}}""") == Seq(1L, 2L, 3L))
    assert(ids("""{"age": {"$type": "number"}}""") == Seq(1L, 2L, 3L, 4L))
    assert(ids("""{"tags": {"$type": "array"}}""") == Seq(1L, 2L, 3L))
    assert(ids("""{"props.score": {"$type": "number"}}""") == Seq(1L, 2L))
  }

  test("parser limits: depth and array size") {
    val deep = (1 to 40).foldLeft("""{"a": 1}""")((j, _) => s"""{"$$not": $j}""")
    assertThrows[IllegalArgumentException](Filter.parse(deep))
    val big = (1 to 1001).map(i => s"""{"a": $i}""").mkString("""{"$or": [""", ",", "]}")
    assertThrows[IllegalArgumentException](Filter.parse(big))
  }

  test("$elemMatch over struct arrays") {
    val nested = Seq(
      (1L, Seq((1, "a"), (5, "b"))),
      (2L, Seq((9, "c"))),
      (3L, Seq.empty[(Int, String)]),
    ).toDF("id", "items")
      .withColumn("items", col("items").cast("array<struct<qty:int,sku:string>>"))
    val f = Filter.parse("""{"items": {"$elemMatch": {"qty": {"$gt": 4}}}}""")
    val got = nested.filter(FilterCompiler.compile(f, nested))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
  }
}
