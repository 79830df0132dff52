package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pre-execution cost estimation (SURVEY.md §4.1; reference:
  * src/search/cost_estimator.rs:513-820 and the `/search/estimate`
  * endpoint / `estimate` CLI, admin.rs:467-500).
  *
  * The reference's cost model ranks four strategies (HNSW, brute-force,
  * HNSW+post-filter, HNSW+pre-filter) with fixed per-op constants — we
  * reproduce the numbers verbatim for estimate/EXPLAIN parity. On Spark
  * the physical decisions belong to Catalyst (its CBO sees real stats),
  * so this surface is informational: the narrative the reference's users
  * expect, plus a pointer to `df.queryExecution` for the true plan. The
  * HNSW math is kept even though our ANN is IVF — it is the cost VOCABULARY
  * of the reference ("what would the embedded engine have chosen"), and the
  * brute-force row is exactly our exact-scan path.
  */
object CostEstimator {

  final case class CollectionStatistics(
      totalVectors: Long, dimensions: Int, deletionRatio: Double = 0.0,
      efSearch: Int = 50, m: Int = 16) {
    def activeVectors: Long =
      (totalVectors * (1.0 - deletionRatio)).toLong
  }

  final case class Cost(
      strategy: String, estimatedLatencyMs: Double, estimatedMemoryMb: Double,
      distanceComputations: Long, nodesVisited: Long, candidateSetSize: Long,
      filterEvaluations: Long, rationale: Seq[String])

  // reference constants (cost_estimator.rs:532-539)
  private val DistanceCostUs = 0.5
  private val FilterCostUs = 0.1
  private val BruteForceThreshold = 5000L

  private def layers(n: Long): Long =
    math.max(1L, math.ceil(math.log(math.max(n, 1L).toDouble) / math.log(2.0)).toLong)

  def estimateHnsw(s: CollectionStatistics, k: Int): Cost = {
    val n = s.activeVectors
    val nodes = s.efSearch.toLong * layers(n)
    val dists = nodes * s.m
    val cand = math.max(s.efSearch, k).toLong
    Cost("hnsw",
      dists * DistanceCostUs / 1000.0,
      cand * s.dimensions * 4.0 / (1024 * 1024),
      dists, nodes, cand, 0L,
      Seq(s"HNSW selected for $n vectors (log-time search)",
        s"ef_search=${s.efSearch}, M=${s.m}, layers≈${layers(n)}",
        s"~$dists distance computations estimated") ++
        (if (n < BruteForceThreshold)
          Seq(s"Note: dataset small enough for brute-force ($n < $BruteForceThreshold)")
        else Nil))
  }

  def estimateBruteForce(s: CollectionStatistics, k: Int,
                         filterSelectivity: Option[Double]): Cost = {
    val n = s.activeVectors
    val filterEvals = if (filterSelectivity.isDefined) n else 0L
    Cost("brute_force",
      (n * DistanceCostUs + filterEvals * FilterCostUs) / 1000.0,
      k.toLong * s.dimensions * 4.0 / (1024 * 1024),
      n, n, (n * filterSelectivity.getOrElse(1.0)).toLong, filterEvals,
      Seq(s"Brute-force scan of $n vectors",
        if (n <= BruteForceThreshold)
          "Preferred for small datasets (guaranteed 100% recall)"
        else "Warning: dataset may be too large for brute-force"))
  }

  def estimateHnswPostFilter(s: CollectionStatistics, k: Int,
                             selectivity: Double): Cost = {
    val n = s.activeVectors
    val overFetch = math.ceil(1.0 / math.max(selectivity, 0.01)).toLong
    val fetchK = k * math.min(overFetch, 20L)
    val adjustedEf = math.max(s.efSearch.toLong, fetchK)
    val nodes = adjustedEf * layers(n)
    val dists = nodes * s.m
    Cost("hnsw_post_filter",
      (dists * DistanceCostUs + fetchK * FilterCostUs) / 1000.0,
      fetchK * s.dimensions * 4.0 / (1024 * 1024),
      dists, nodes, fetchK, fetchK,
      Seq(s"HNSW+PostFilter: fetch ${overFetch}×k=$fetchK candidates, then filter",
        f"Filter selectivity: ${selectivity * 100}%.1f%%"))
  }

  def estimateHnswPreFilter(s: CollectionStatistics, k: Int,
                            selectivity: Double): Cost = {
    val n = s.activeVectors
    val visitFactor = math.ceil(math.sqrt(1.0 / math.max(selectivity, 0.01))).toLong
    val adjustedEf = s.efSearch * math.min(visitFactor, 10L)
    val nodes = adjustedEf * layers(n)
    val dists = nodes * s.m
    Cost("hnsw_pre_filter",
      (dists * DistanceCostUs + nodes * FilterCostUs) / 1000.0,
      k.toLong * s.dimensions * 4.0 / (1024 * 1024),
      dists, nodes, (n * selectivity).toLong, nodes,
      Seq(f"HNSW+PreFilter: evaluate filter during traversal (selectivity ${selectivity * 100}%.1f%%)",
        s"Visit factor ${visitFactor}×, adjusted ef=$adjustedEf"))
  }

  /** Rank candidate strategies by estimated latency (cost_estimator.rs
    * plan(): HNSW and brute always; post-filter when sel < 0.5; pre-filter
    * when sel > 0.01). Head row = chosen plan.
    */
  def plan(s: CollectionStatistics, k: Int,
           filterSelectivity: Option[Double] = None): Seq[Cost] = {
    val base = Seq(estimateHnsw(s, k), estimateBruteForce(s, k, filterSelectivity))
    val filtered = filterSelectivity.toSeq.flatMap { sel =>
      (if (sel < 0.5) Seq(estimateHnswPostFilter(s, k, sel)) else Nil) ++
        (if (sel > 0.01) Seq(estimateHnswPreFilter(s, k, sel)) else Nil)
    }
    (base ++ filtered).sortBy(_.estimatedLatencyMs)
  }

  /** The estimate surface as a DataFrame (the `/search/estimate` response
    * shape), ranked best-first.
    */
  def estimate(spark: SparkSession, s: CollectionStatistics, k: Int,
               filterSelectivity: Option[Double] = None): DataFrame = {
    import spark.implicits._
    plan(s, k, filterSelectivity).map(c =>
      (c.strategy, c.estimatedLatencyMs, c.estimatedMemoryMb,
        c.distanceComputations, c.nodesVisited, c.candidateSetSize,
        c.rationale.mkString("; ")))
      .toDF("strategy", "estimated_latency_ms", "estimated_memory_mb",
        "distance_computations", "nodes_visited", "candidate_set_size",
        "rationale")
  }

  // ------------------------------------------- adaptive (bandit) optimizer

  /** Multi-armed-bandit strategy selection over observed latencies
    * (cost_estimator.rs:880-1040 AdaptiveOptimizer). Deterministic like the
    * reference: UCB1 is history-driven; epsilon-greedy "randomness" is the
    * reference's Knuth-hash probe of the observation counter. Reward =
    * 1/(1+latency_ms). Cold start explores the least-pulled arm until every
    * arm has `minObservations`.
    */
  final class AdaptiveOptimizer(ucbConfidence: Double = 2.0,
                                epsilonGreedy: Option[Double] = None,
                                minObservations: Long = 5) {
    final case class Arm(var pulls: Long = 0, var totalReward: Double = 0.0,
                         var lastLatencyMs: Double = 0.0) {
      def meanReward: Double = if (pulls == 0) 0.0 else totalReward / pulls
    }
    val armNames = Seq("hnsw", "brute_force", "hnsw_pre_filter", "hnsw_post_filter")
    private val arms = scala.collection.mutable.LinkedHashMap(
      armNames.map(_ -> Arm()): _*)
    private var totalObs = 0L

    def observe(strategy: String, latencyMs: Double): Unit = {
      val a = arms.getOrElseUpdate(strategy, Arm())
      val reward = 1.0 / (1.0 + latencyMs)
      a.pulls += 1; a.totalReward += reward; a.lastLatencyMs = latencyMs
      totalObs += 1
    }

    def select(): String = {
      val cold = arms.filter(_._2.pulls < minObservations)
      if (cold.nonEmpty) return cold.minBy(_._2.pulls)._1
      epsilonGreedy match {
        case Some(eps) =>
          val probe = (totalObs * 2654435761L) % 1000
          if (probe.toDouble < eps * 1000.0) arms.minBy(_._2.pulls)._1
          else bestArm
        case None =>
          val lnTotal = math.log(math.max(totalObs, 1L).toDouble)
          arms.filter(_._2.pulls > 0).maxBy { case (_, a) =>
            a.meanReward + ucbConfidence * math.sqrt(lnTotal / a.pulls)
          }._1
      }
    }

    def bestArm: String =
      arms.filter(_._2.pulls > 0)
        .maxByOption(_._2.meanReward).map(_._1).getOrElse("hnsw")

    def armStats: Seq[(String, Long, Double, Double)] =
      arms.toSeq.map { case (n, a) =>
        (n, a.pulls, a.meanReward,
          if (a.pulls > 0) 1.0 / a.meanReward - 1.0 else 0.0)
      }

    def totalObservations: Long = totalObs
    def reset(): Unit = { arms.mapValuesInPlace((_, _) => Arm()); totalObs = 0 }
  }

  /** Statistics for a live collection DataFrame (the CLI path:
    * admin.rs:470-480 derives them from collection stats).
    */
  def statsOf(df: DataFrame, vecCol: String = "vector",
              deletedCol: Option[String] = None): CollectionStatistics = {
    import org.apache.spark.sql.functions._
    val row = df.agg(
      count(lit(1)).as("n"),
      max(size(col(vecCol))).as("dims"),
      sum(when(deletedCol.map(col(_)).getOrElse(lit(false)), 1L)
        .otherwise(0L)).as("deleted"))
      .collect()(0)
    val n = row.getLong(0)
    val deleted = if (row.isNullAt(2)) 0L else row.getLong(2)
    CollectionStatistics(n, if (row.isNullAt(1)) 0 else row.getInt(1),
      if (n + deleted > 0) deleted.toDouble / (n + deleted) else 0.0)
  }
}
