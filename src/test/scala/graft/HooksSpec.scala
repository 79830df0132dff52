package graft

import org.apache.spark.sql.functions._

import graft.ops.Hooks

/** Hook registry + built-ins (reference: src/hooks.rs). */
class HooksSpec extends SparkSpec {
  import spark.implicits._

  test("normalize_l2 unit-norms vectors; zero vectors pass unchanged (hooks.rs:257-268)") {
    val df = Seq((1, Seq(3f, 4f)), (2, Seq(0f, 0f))).toDF("id", "vec")
    val out = Hooks.normalizeL2("vec")(df)
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(math.abs(out(1).map(x => x * x).sum - 1f) < 1e-6)
    assert(out(1).head == 0.6f && out(1)(1) == 0.8f)
    assert(out(2) == Seq(0f, 0f))
  }

  test("validate_dimensions splits instead of aborting; rejects are quarantined") {
    val reg = new Hooks.Registry
    val df = Seq((1, Seq(1f, 2f, 3f)), (2, Seq(1f, 2f))).toDF("id", "vec")
    val ok = Hooks.validateDimensions("vec", 3, reg)(df)
    assert(ok.select("id").as[Int].collect().toSeq == Seq(1))
    assert(reg.rejects("validate_dimensions").get
      .select("id").as[Int].collect().toSeq == Seq(2))
  }

  test("registered chain runs in registration order and counts invocations") {
    val reg = new Hooks.Registry
    reg.registerInsertHook("normalize", Hooks.normalizeL2("vec"))
    reg.registerInsertHook("stamp", Hooks.addTimestamp(42L))
    val out = reg.runInsertHooks(Seq((1, Seq(3f, 4f))).toDF("id", "vec"))
    val row = out.collect().head
    assert(row.getAs[Long]("_inserted_at") == 42L)
    assert(reg.runInsertHooks(out).collect().nonEmpty)
    assert(reg.stats == Map("normalize" -> 2L, "stamp" -> 2L))
    assert(reg.listHooks == (Seq("normalize", "stamp"), Seq()))
    assert(reg.removeInsertHook("stamp") && !reg.removeInsertHook("stamp"))
    assert(reg.listHooks._1 == Seq("normalize"))
  }

  test("search hooks: threshold then dedup keep the best row per id") {
    val reg = new Hooks.Registry
    reg.registerSearchHook("thr", Hooks.scoreThreshold("distance", 0.5))
    reg.registerSearchHook("dedup", Hooks.dedupResults("id", "distance"))
    val results = Seq(("a", 0.1), ("a", 0.3), ("b", 0.2), ("c", 0.9))
      .toDF("id", "distance")
    val out = reg.runSearchHooks(results)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 0.1, "b" -> 0.2), "c over threshold; dup a dropped")
  }
}
