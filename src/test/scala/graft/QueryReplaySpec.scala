package graft

import org.apache.spark.sql.DataFrame

import graft.ops.QueryReplay

/** Mirrors query_replay.rs's tests (:319-400) on the frame-shaped
  * replayer, plus the skip/empty corners the report semantics pin.
  */
class QueryReplaySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, Seq[String], Double)*): DataFrame =
    rows.toDF("query_idx", "ids", "latency_ms")

  test("perfect recall passes (query_replay.rs:319-337)") {
    val rep = QueryReplay.report(
      run((0L, Seq("d1", "d2"), 3.2)),
      run((0L, Seq("d1", "d2"), 2.8))).collect()(0)
    assert(rep.getAs[Long]("total_queries") == 1L)
    assert(rep.getAs[Double]("avg_recall") == 1.0)
    assert(rep.getAs[Boolean]("passed"))
  }

  test("recall regression detected below threshold (:339-359)") {
    val rep = QueryReplay.report(
      run((0L, Seq("d1", "d2", "d3"), 3.0)),
      run((0L, Seq("d1", "d4"), 5.0)), threshold = 0.8).collect()(0)
    assert(rep.getAs[Double]("avg_recall") < 0.5)
    assert(!rep.getAs[Boolean]("passed"))
    assert(rep.getAs[Long]("regressions") == 1L)
    assert(rep.getAs[Double]("regression_threshold") == 0.8)
  }

  test("latency change tracks percent vs original (:361-371)") {
    val rep = QueryReplay.report(
      run((0L, Seq.empty[String], 10.0)),
      run((0L, Seq.empty[String], 15.0))).collect()(0)
    assert(math.abs(rep.getAs[Double]("avg_latency_change_pct") - 50.0) < 1e-9)
    // empty original ids → recall 1.0 (query_replay.rs:249-253)
    assert(rep.getAs[Double]("avg_recall") == 1.0)
  }

  test("missing and new ids, sorted ascending (:388-400)") {
    val d = QueryReplay.details(
      run((0L, Seq("d2", "d1"), 1.0)),
      run((0L, Seq("d3", "d1"), 1.0))).collect()(0)
    assert(d.getAs[scala.collection.Seq[String]]("missing_ids") == Seq("d2"))
    assert(d.getAs[scala.collection.Seq[String]]("new_ids") == Seq("d3"))
    assert(d.getAs[Double]("recall") == 0.5)
  }

  test("queries without a replayed counterpart are skipped; none " +
      "replayed → vacuous pass with min_recall 1.0") {
    val d = QueryReplay.details(
      run((0L, Seq("a"), 1.0), (1L, Seq("b"), 1.0)),
      run((1L, Seq("b"), 1.0))).collect()
    assert(d.map(_.getAs[Long]("query_idx")).toSeq == Seq(1L))
    val rep = QueryReplay.report(
      run((0L, Seq("a"), 1.0)), run()).collect()(0)
    assert(rep.getAs[Long]("total_queries") == 0L)
    assert(rep.getAs[Double]("avg_recall") == 1.0)
    assert(rep.getAs[Double]("min_recall") == 1.0)
    assert(rep.getAs[Boolean]("passed"))
  }

  test("duplicate ids dedupe before set arithmetic; zero original " +
      "latency yields zero change") {
    val d = QueryReplay.details(
      run((0L, Seq("a", "a", "b"), 0.0)),
      run((0L, Seq("a"), 9.0))).collect()(0)
    assert(d.getAs[Double]("recall") == 0.5)
    assert(d.getAs[Double]("latency_change_pct") == 0.0)
  }
}
