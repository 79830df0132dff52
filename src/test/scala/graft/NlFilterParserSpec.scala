package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.filter._
import graft.filter.NlFilterParser.{FieldHint, FieldType}

/** Mirrors the reference's own test suite (nl_filter_parser.rs:425-558)
  * case-for-case, plus the longest-keyword and quote-trim corners the
  * rules imply.
  */
class NlFilterParserSpec extends AnyFunSuite {

  private def obj(v: JValue): Map[String, JValue] = v match {
    case JObj(fields) => fields.toMap
    case other        => fail(s"expected object, got $other")
  }

  test("simple equality") {
    val r = NlFilterParser().parse("category is 'books'")
    assert(r.clauses.size == 1)
    assert(r.clauses.head.field == "category")
    assert(r.clauses.head.op == FilterOp.Eq)
    assert(r.clauses.head.value == JStr("books"))
    assert(r.confidence > 0.9)
    assert(r.filter.isDefined)
  }

  test("numeric comparison") {
    val r = NlFilterParser().parse("price less than 50")
    assert(r.clauses.head.field == "price")
    assert(r.clauses.head.op == FilterOp.Lt)
    assert(r.clauses.head.value == JNum(50))
  }

  test("compound and") {
    val r = NlFilterParser().parse("category is 'books' and price less than 50")
    assert(r.clauses.size == 2)
    assert(obj(r.filterJson).contains("$and"))
  }

  test("compound or") {
    val r = NlFilterParser().parse("status is 'active' or status is 'pending'")
    assert(r.clauses.size == 2)
    assert(obj(r.filterJson).contains("$or"))
  }

  test("date filter keywords map to comparisons") {
    val r = NlFilterParser().parse("created after 2023-01-01")
    assert(r.clauses.head.field == "created")
    assert(r.clauses.head.op == FilterOp.Gt)
  }

  test("at least is Gte") {
    val r = NlFilterParser().parse("score at least 0.5")
    assert(r.clauses.head.op == FilterOp.Gte)
    assert(r.clauses.head.value == JNum(0.5))
  }

  test("contains operator") {
    val r = NlFilterParser().parse("title contains 'machine learning'")
    assert(r.clauses.head.op == FilterOp.Contains)
    assert(r.clauses.head.value == JStr("machine learning"))
  }

  test("field aliases resolve") {
    val r = NlFilterParser().addAlias("cost", "price").parse("cost less than 100")
    assert(r.clauses.head.field == "price")
  }

  test("boolean field hint coerces yes/no") {
    val p = NlFilterParser().addHint(FieldHint("active", FieldType.Bool))
    assert(p.parse("active is yes").clauses.head.value == JBool(true))
    assert(p.parse("active is no").clauses.head.value == JBool(false))
    assert(p.parse("active is maybe").clauses.head.value == JStr("maybe"))
  }

  test("empty input and unparseable input are errors") {
    intercept[IllegalArgumentException](NlFilterParser().parse(""))
    intercept[IllegalArgumentException](NlFilterParser().parse("   "))
    intercept[IllegalArgumentException](NlFilterParser().parse("xyzq abcq"))
  }

  test("single clause has no $and wrapper") {
    val f = obj(NlFilterParser().parse("type is 'blog'").filterJson)
    assert(!f.contains("$and"))
    assert(f.contains("type"))
  }

  test("is not parses as Ne (longest keyword wins over is)") {
    val r = NlFilterParser().parse("status is not 'deleted'")
    assert(r.clauses.head.op == FilterOp.Ne)
    assert(r.clauses.head.value == JStr("deleted"))
  }

  test("substring keyword matching wart is reference-faithful: the 'is' " +
      "INSIDE 'distance' splits the clause (nl_filter_parser.rs:295)") {
    // first-occurrence indexOf, not word boundaries: "distance is 5"
    // finds "is" at index 1 of "d·is·tance" → field "d", value
    // "tance is 5". Pinned BOTH WAYS: a word-boundary "fix" would
    // produce field "distance" / value 5 and must fail here until a
    // reference-divergence adjudication retires this case.
    val c = NlFilterParser().parse("distance is 5").clauses.head
    assert(c.field == "d")
    assert(c.op == FilterOp.Eq)
    assert(c.value == JStr("tance is 5"))
  }

  test("float value parses numerically") {
    assert(NlFilterParser().parse("score greater than 0.85")
      .clauses.head.value == JNum(0.85))
  }

  test("partial parse lowers confidence and keeps the remainder") {
    val r = NlFilterParser().parse("category is 'tech' and some unknown clause")
    assert(r.confidence < 1.0)
    assert(r.unparsedRemainder.isDefined)
    assert(r.clauses.size == 1)
  }

  test("number hint falls back to auto-typing on a non-numeric value") {
    val p = NlFilterParser().addHint(FieldHint("price", FieldType.Number))
    assert(p.parse("price is 12").clauses.head.value == JNum(12))
    assert(p.parse("price is cheap").clauses.head.value == JStr("cheap"))
  }

  test("operator symbols: <= and >= beat their one-char prefixes") {
    assert(NlFilterParser().parse("price <= 10").clauses.head.op == FilterOp.Lte)
    assert(NlFilterParser().parse("price >= 10").clauses.head.op == FilterOp.Gte)
    assert(NlFilterParser().parse("price < 10").clauses.head.op == FilterOp.Lt)
    assert(NlFilterParser().parse("price != 10").clauses.head.op == FilterOp.Ne)
  }

  test("parsed filter compiles and filters like the hand-written JSON") {
    val spark = SparkSpec.session
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nl = NlFilterParser().parse("lang is 'en' and n_chars at least 200")
    val viaNl = df.filter(FilterCompiler.compile(nl.filter.get, df)).count()
    val viaJson = df.filter(FilterCompiler.compile(Filter.parse(
      """{"$and": [{"lang": {"$eq": "en"}}, {"n_chars": {"$gte": 200}}]}"""),
      df)).count()
    assert(viaNl == viaJson && viaNl > 0)
  }
}
