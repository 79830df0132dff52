package graft

/** Physical-plan audit over the declared driver queries (SURVEY §4): the
  * scale-critical family — dedup, blocked graph build, branching, ANN,
  * text indexes — must never plan a CartesianProduct, and the blocked/
  * banded operators must not fall back to BroadcastNestedLoopJoin either.
  * (Some queries legitimately nested-loop a 1-row broadcast query-vector
  * frame or run a documented exact-oracle self-join — those are excluded
  * by name, not waved through silently.)
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // name lists live in PlanAuditLedger, shared with PlanSweepSpec so the
  // two specs' coverage of SparkEntry.all is provably total
  import PlanAuditLedger.{strictQueries, noCartesianQueries}

  for (name <- strictQueries)
    test(s"$name plans no cartesian and no nested-loop join") {
      val plan = SparkEntry.all(name).fn(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name: $plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name: $plan")
    }

  for (name <- noCartesianQueries)
    test(s"$name plans no cartesian product") {
      val plan = SparkEntry.all(name).fn(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name: $plan")
    }

  test("q5_region_revenue: every dimension broadcasts, p_size pushes to the scan") {
    val plan = SparkEntry.all("q5_region_revenue").fn(spark, dir)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4, s"expected 4 broadcast joins, got $broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact table must not sort-merge:\n$plan")
    assert(plan.contains("LessThanOrEqual(p_size,25)"),
      s"p_size filter not pushed to the parquet scan:\n$plan")
  }

  // dedup_insert_reject's gate runs at correctness scale where the exact
  // |incoming|×|coll| form is definitional — so the AUDITED shape is the
  // one a big collection takes: above maxExactRows the 1-NN must plan as
  // an IVF cell equi-join, never a cartesian or nested loop
  test("dedupInsert blocked path plans an equi-join, no cartesian/BNLJ") {
    import org.apache.spark.sql.functions._
    val vec = array((col("id") % 5 + 1).cast("float"),
      (col("id") % 3 + 1).cast("float"), lit(1f))
    val coll = spark.range(500).select(col("id"), vec.as("vector"),
      lit("{}").as("metadata"))
    val incoming = spark.range(3).select((col("id") + 1000).as("id"),
      vec.as("vector"), lit("{}").as("metadata"))
    val got = graft.ops.Mutations.dedupInsert(coll, incoming, 0.0001,
      graft.ops.Mutations.DedupPolicy.Reject,
      maxExactRows = 0, numCells = 4, nprobe = 2)
    for (df <- Seq(got.outcomes, got.collection)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  // narrow per-row operators: the ONLY exchange allowed is the gate's
  // final ORDER BY (range partitioning) — a hash repartition anywhere
  // means the "streams at scan speed" claim is false
  for (name <- Seq("gopher_rules", "pii_scrub", "c4_rules"))
    test(s"$name shuffles only for its final sort") {
      val plan = SparkEntry.all(name).fn(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning"), s"$name: $plan")
    }

  // the "k-bounded candidate list" contracts on the unpartitioned-ranking
  // fusion sites are executable: a frame Catalyst statically knows to
  // exceed the global-window bound is rejected at plan time (zero runtime
  // cost); the engine's own limit-terminated shapes pass
  test("k-bounded guards: statically oversized candidate frames rejected " +
      "at Rrf.fuse / ensembleRerank / CrossCollection.merge; " +
      "limit-bounded shapes pass") {
    import org.apache.spark.sql.functions._
    import graft.internal.Guards
    val big = spark.range(Guards.MaxGlobalWindowRows + 1).select(
      col("id").cast("string").as("id"),
      col("id").cast("double").as("distance"),
      col("id").cast("double").as("score"))
    // the mechanism itself: Catalyst statically bounds range→project
    assert(big.queryExecution.analyzed.maxRows
      .contains(Guards.MaxGlobalWindowRows + 1))
    intercept[IllegalArgumentException](graft.text.Rrf.fuse(big, big.limit(10)))
    intercept[IllegalArgumentException](graft.text.Rrf.fuse(big.limit(10), big))
    intercept[IllegalArgumentException](
      graft.ops.Extras.ensembleRerank(Seq((big, 1.0)), 5))
    intercept[IllegalArgumentException](
      graft.ops.CrossCollection.merge(Seq("a" -> big), 5))
    // limit-terminated candidate lists — the engine's own call shape
    val fused = graft.text.Rrf.fuse(
      big.limit(100).select("id", "distance"),
      big.limit(100).select("id", "score"))
    assert(fused.columns.contains("rrf_score"))
    assert(fused.count() == 10)
  }

  // CrossModal's per-modality window rides post-limit frames by
  // construction: the fused result of a search over an unbounded-size
  // modality table is STATICALLY bounded by lists × perModalityK, and the
  // per-modality top-k plans as TakeOrderedAndProject, not a global sort
  test("crossModal search output is statically k-bounded; per-modality " +
      "top-k is TakeOrderedAndProject") {
    import org.apache.spark.sql.functions._
    val table = spark.range(100000).select(
      col("id").cast("string").as("id"),
      array((col("id") % 7 + 1).cast("float"),
        (col("id") % 5 + 1).cast("float")).as("vector"))
    val eng = new graft.ops.CrossModal.Engine(
      Seq(graft.ops.CrossModal.Modality("text", table, 2),
        graft.ops.CrossModal.Modality("image", table, 2)),
      perModalityK = 10)
    val res = eng.search(spark, Array(1f, 2f), Seq("text", "image"), k = 5)
    assert(res.queryExecution.analyzed.maxRows.exists(_ <= 20L),
      s"fused frame must be statically bounded: " +
        s"${res.queryExecution.analyzed.maxRows}")
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
