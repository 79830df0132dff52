package graft

import org.apache.spark.sql.functions._

import graft.ops.DistributedRank

/** Executable form of the release-on-failure discipline: force a job to
  * fail INSIDE an operator that pins intermediates and assert the
  * session's persistent-RDD set is exactly what it was before the call —
  * the pin must not outlive the failed call. A positive control proves
  * the detector actually sees pinned RDDs (a spec that would pass
  * against a leaking implementation tests nothing).
  *
  * Suites run sequentially in the forked test JVM, so the before/after
  * snapshots cannot race another suite's pins.
  */
class FailurePathReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def pinnedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** A failed-before-materialization Dataset.persist never registers an
    * RDD, so [[pinnedIds]] alone can't see that leak — the CacheManager
    * entry (which pins the plan and would re-materialize on reuse) is
    * the observable. Entry count read reflectively (the `cachedData`
    * seq is private and other suites' long-lived caches make absolute
    * emptiness meaningless); snapshot before, compare after.
    */
  private def cachedPlanCount: Int = {
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    val f = cm.getClass.getDeclaredField("cachedData")
    f.setAccessible(true)
    f.get(cm).asInstanceOf[IndexedSeq[_]].size
  }

  /** Throws at RUNTIME. Inputs below sit on `spark.range`, never a
    * local Seq: ConvertToLocalRelation folds deterministic expressions
    * over LocalRelation at optimization time, which would fire this
    * during persist()/planning — before any pin exists — and the test
    * would silently stop exercising the job-failure path.
    */
  private val boom = udf { (v: Double) =>
    if (v >= 0) throw new IllegalStateException("boom"); v
  }

  test("positive control: both detectors see a pinned dataset") {
    val beforeRdds = pinnedIds
    val beforePlans = cachedPlanCount
    val df = (1 to 100).toDF("x").persist()
    assert(cachedPlanCount == beforePlans + 1,
      "persist must register a CacheManager entry even unmaterialized")
    df.count() // materialize so the cached RDD registers too
    assert(pinnedIds != beforeRdds,
      "persist+count must register a pinned RDD")
    df.unpersist(blocking = true)
    assert(pinnedIds == beforeRdds && cachedPlanCount == beforePlans)
  }

  test("rankedByRange releases its range-partitioned pin when the " +
      "counts job fails") {
    val beforeRdds = pinnedIds
    val beforePlans = cachedPlanCount
    val df = spark.range(50).select(col("id"),
      boom(col("id").cast("double")).as("v"))
    val e = intercept[Exception] {
      DistributedRank.rankedByRange(
        df, keys = Nil, order = Seq(col("v").asc), rankCol = "r",
        nCol = "n", numPartitions = 3)
    }
    assert(e.getMessage != null)
    assert(pinnedIds == beforeRdds,
      s"leaked pins: ${pinnedIds.diff(beforeRdds)}")
    assert(cachedPlanCount == beforePlans, "leaked CacheManager entry")
  }

  test("QueryAnalytics.patterns leaks nothing when its input fails " +
      "to evaluate") {
    val before = pinnedIds
    val log = spark.range(40).select(
      lit("c").as("collection"), lit("search").as("operation"),
      (col("id") % 2 === 0).as("has_filter"), lit(10).as("k"),
      col("id").as("ts"), boom(col("id").cast("double")).as("latency_ms"),
      lit(5).as("result_count"))
    val beforePlans = cachedPlanCount
    intercept[Exception] {
      graft.ops.QueryAnalytics.patterns(log, rankPartitions = 3).collect()
    }
    assert(pinnedIds == before,
      s"leaked pins: ${pinnedIds.diff(before)}")
    assert(cachedPlanCount == beforePlans, "leaked CacheManager entry")
  }

  test("CompressionAdvisor.analyze releases its sample cache on the " +
      "empty-input require and on a failed sample job") {
    val before = pinnedIds
    val beforePlans = cachedPlanCount
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    intercept[IllegalArgumentException] {
      graft.ann.CompressionAdvisor.analyze(empty, col("vec"))
    }
    assert(pinnedIds == before, s"leaked pins: ${pinnedIds.diff(before)}")
    assert(cachedPlanCount == beforePlans, "leaked CacheManager entry")
    val bad = spark.range(30).select(col("id"),
      array(boom(col("id").cast("double")).cast("float")).as("vec"))
    intercept[Exception] {
      graft.ann.CompressionAdvisor.analyze(bad, col("vec"))
    }
    assert(pinnedIds == before, s"leaked pins: ${pinnedIds.diff(before)}")
    assert(cachedPlanCount == beforePlans, "leaked CacheManager entry")
  }
}
