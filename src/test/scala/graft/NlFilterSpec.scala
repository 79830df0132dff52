package graft

import graft.filter.{Filter, FilterOp, JNum, JStr, JBool, JArr}
import graft.ops.NlFilter

class NlFilterSpec extends SparkSpec {
  private val now = 1000000L

  test("temporal + comparison + search text extraction (nl_filter.rs doc example)") {
    val p = NlFilter.parse(
      "Show me documents from last week about machine learning with score > 0.8", now)
    assert(p.temporal.exists(t =>
      t.expression == "last week" && t.start.contains(now - 604800) &&
        t.end.contains(now)))
    val conds = p.filter.toSeq.flatMap {
      case Filter.And(fs) => fs
      case f => Seq(f)
    }
    assert(conds.contains(Filter.Condition("score", FilterOp.Gt, JNum(0.8))))
    assert(p.intents.contains("search") && p.intents.contains("temporal"))
    assert(p.searchText.contains("machine") && p.searchText.contains("learning"))
    assert(!p.searchText.contains("0.8"))
    assert(p.confidence > 0.5 && p.confidence <= 1.0)
  }

  test("next-word, boolean (with negation), and list extractors") {
    val cat = NlFilter.parse("find articles category science", now)
    assert(cat.filter.toSeq.flatMap { case Filter.And(fs) => fs; case f => Seq(f) }
      .contains(Filter.Condition("category", FilterOp.Eq, JStr("science"))))

    val pub = NlFilter.parse("published posts", now)
    assert(pub.filter.contains(Filter.Condition("is_published", FilterOp.Eq, JBool(true))))
    val unpub = NlFilter.parse("not published posts", now)
    assert(unpub.filter.toSeq.flatMap { case Filter.And(fs) => fs; case f => Seq(f) }
      .contains(Filter.Condition("is_published", FilterOp.Eq, JBool(false))))

    val tagged = NlFilter.parse("images tagged landscape", now)
    assert(tagged.filter.contains(
      Filter.Condition("tags", FilterOp.In, JArr(Vector(JStr("landscape"))))))
  }

  test("wordy comparisons: greater than / less than / at least") {
    def scoreCond(q: String) =
      NlFilter.parse(q, now).filter.toSeq.flatMap {
        case Filter.And(fs) => fs; case f => Seq(f)
      }.collectFirst { case c @ Filter.Condition("score", _, _) => c }.get
    assert(scoreCond("score greater than 0.5") ==
      Filter.Condition("score", FilterOp.Gt, JNum(0.5)))
    assert(scoreCond("score less than 3") ==
      Filter.Condition("score", FilterOp.Lt, JNum(3)))
    assert(scoreCond("score at least 2") ==
      Filter.Condition("score", FilterOp.Gte, JNum(2)))
    assert(scoreCond("score is 7") ==
      Filter.Condition("score", FilterOp.Eq, JNum(7)))
  }

  test("parsed filter compiles and runs through the standard FilterCompiler") {
    import spark.implicits._
    val df = Seq(("a", 0.9, 100L), ("b", 0.3, 999000L), ("c", 0.95, 999000L))
      .toDF("id", "score", "inserted_at")
    // nb: "from X" would extract author=X (reference quirk — "from" is an
    // author keyword and its stopword list lacks "this"), so phrase without it
    val p = NlFilter.parse("find docs this week with score greater than 0.5", now)
    val both = Filter.And(p.filter.toSeq ++
      p.temporal.map(NlFilter.temporalFilter(_)).toSeq)
    val got = df.filter(graft.filter.FilterCompiler.compile(both, df))
      .select("id").as[String].collect().toSet
    assert(got == Set("c")) // score>0.5 AND inserted within the week window
  }
}
