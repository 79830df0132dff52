package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Federated search result merging (SURVEY.md §2.3; reference:
  * src/search/federated/merger.rs:53-165, sharding.rs:5-88).
  *
  * The reference federates across live instances — discovery, gossip,
  * health checks, per-instance latency — none of which has a Spark
  * analogue (the cluster IS the execution fabric). What survives
  * re-expression is the RESULT-MERGER algebra: given per-source ranked
  * result lists for the same query, produce one merged top-k. Sources
  * here are any DataFrames of (id, distance [, payload…]) — different
  * collections, different index variants (IVF vs exact vs quantized), or
  * genuinely remote result sets read from parquet.
  *
  * Every strategy is a bounded-input operator: per-source lists are
  * k-sized by construction (the per-source search already truncated), so
  * windows/groupBys here shuffle at most |sources|×k rows — driver-free
  * and safe at any scale.
  *
  * Strategies (merger.rs MergeStrategy):
  *   - DistanceBased: pool, dedup by id keeping the SMALLEST distance,
  *     ascending top-k (merger.rs:67-87).
  *   - ReciprocalRankFusion: per-source rank r (1-based) → Σ 1/(60+r) per
  *     id, descending top-k (merger.rs:88-114). The surviving row's
  *     payload is the best-distance occurrence (the reference keeps the
  *     first HashMap insertion — nondeterministic; we document the
  *     deterministic choice).
  *   - FirstResponse: the first source (in argument order) with any rows
  *     wins (merger.rs:115-129); the reference's "first to respond" race
  *     has no deterministic analogue, so argument order stands in.
  *   - PriorityWeighted: distance divided by the source's priority weight
  *     before the DistanceBased merge (config.rs:102-113; the reference
  *     simplifies this to plain distance-merge — weights default to 1.0
  *     which reproduces that exactly).
  *   - Consensus: ids seen by more sources rank first; ties by average
  *     distance ascending (merger.rs:130-165).
  *
  * Cross-instance dedup (sharding.rs DedupStrategy) is exposed separately:
  * BestDistance / FirstSeen (source argument order) / AverageDistance.
  */
object Federated {

  sealed trait Strategy
  object Strategy {
    case object DistanceBased extends Strategy
    case object ReciprocalRankFusion extends Strategy
    case object FirstResponse extends Strategy
    case object PriorityWeighted extends Strategy
    case object Consensus extends Strategy
  }

  sealed trait Dedup
  object Dedup {
    case object BestDistance extends Dedup
    case object FirstSeen extends Dedup
    case object AverageDistance extends Dedup
  }

  /** Tag and pool per-source result sets into one DataFrame with
    * `__source` / `__source_rank` (1-based per-source rank by ascending
    * (distance, id)) columns. Sources must share the (idCol, distCol)
    * schema; payload columns are unioned by name.
    */
  private def pool(sources: Seq[(String, DataFrame)], idCol: String,
                   distCol: String): DataFrame =
    sources.zipWithIndex.map { case ((name, df), i) =>
      val w = Window.partitionBy(lit(1))
        .orderBy(col(distCol).asc, col(idCol).asc)
      // per-source lists are k-bounded: the single-partition window is a
      // deliberate, bounded sort — not a scale hazard
      df.withColumn("__source", lit(name))
        .withColumn("__source_rank", row_number().over(w))
        // POSITIONAL index, not name-keyed: the reference merger ignores
        // source names entirely (merger.rs:67-75 destructures
        // `(_, results)`), so two sources may legally share a name and
        // stay independent — an indexWhere-by-name here would collapse
        // them to the first position, skewing FirstResponse/FirstSeen
        // (the same duplicate-key class as the r15 fusionSearch fix)
        .withColumn("__source_idx", lit(i))
    }.reduce(_ unionByName _)

  /** Merge per-source ranked lists into one top-k (merger.rs:53-66). */
  def merge(sources: Seq[(String, DataFrame)], k: Int,
            strategy: Strategy = Strategy.DistanceBased,
            idCol: String = "id", distCol: String = "distance",
            weights: Map[String, Double] = Map.empty): DataFrame = {
    require(sources.nonEmpty, "federated merge needs at least one source")
    val pooled = pool(sources, idCol, distCol)
    strategy match {
      case Strategy.DistanceBased =>
        dedup(pooled, Dedup.BestDistance, idCol, distCol)
          .orderBy(col(distCol).asc, col(idCol).asc).limit(k)

      case Strategy.PriorityWeighted =>
        val w = sources.map { case (n, _) =>
          (n, weights.getOrElse(n, 1.0)) }.toMap
        val weighted = pooled.withColumn(distCol,
          col(distCol) / w.foldLeft(lit(1.0)) { case (acc, (n, wt)) =>
            when(col("__source") === n, lit(wt)).otherwise(acc) })
        dedup(weighted, Dedup.BestDistance, idCol, distCol)
          .orderBy(col(distCol).asc, col(idCol).asc).limit(k)

      case Strategy.ReciprocalRankFusion =>
        val contrib = pooled
          .withColumn("__rrf", lit(1.0) / (lit(60.0) + col("__source_rank")))
        val scores = contrib.groupBy(col(idCol))
          .agg(sum(col("__rrf")).as("rrf_score"))
        // payload of the surviving row = best-distance occurrence
        dedup(contrib, Dedup.BestDistance, idCol, distCol)
          .join(scores, idCol)
          .orderBy(col("rrf_score").desc, col(idCol).asc).limit(k)

      case Strategy.FirstResponse =>
        val counts = pooled.groupBy(col("__source_idx")).count()
          .orderBy(col("__source_idx").asc)
          .collect() // |sources| rows — bounded
        counts.headOption.map(_.getInt(0)) match {
          case Some(first) =>
            pooled.filter(col("__source_idx") === first)
              .orderBy(col(distCol).asc, col(idCol).asc).limit(k)
          case None => pooled.limit(0)
        }

      case Strategy.Consensus =>
        pooled.groupBy(col(idCol))
          .agg(count(lit(1)).as("consensus_count"),
            avg(col(distCol)).as(distCol))
          .orderBy(col("consensus_count").desc, col(distCol).asc,
            col(idCol).asc)
          .limit(k)
    }
  }

  /** Cross-instance dedup of a pooled result set (sharding.rs:5-88).
    * Input must carry `__source_idx` when FirstSeen is used (i.e. come
    * from [[merge]]'s pooling); BestDistance/AverageDistance need only
    * (idCol, distCol).
    */
  def dedup(pooled: DataFrame, strategy: Dedup,
            idCol: String = "id", distCol: String = "distance"): DataFrame =
    strategy match {
      case Dedup.BestDistance =>
        val w = Window.partitionBy(col(idCol))
          .orderBy(col(distCol).asc, col("__source_idx").asc)
        pooled.withColumn("__pick", row_number().over(w))
          .filter(col("__pick") === 1)
          .drop("__pick", "__source_rank")
      case Dedup.FirstSeen =>
        val w = Window.partitionBy(col(idCol))
          .orderBy(col("__source_idx").asc, col(distCol).asc)
        pooled.withColumn("__pick", row_number().over(w))
          .filter(col("__pick") === 1)
          .drop("__pick", "__source_rank")
      case Dedup.AverageDistance =>
        pooled.groupBy(col(idCol))
          .agg(avg(col(distCol)).as(distCol),
            count(lit(1)).as("sources_seen"))
    }

  /** Federation stats (merger.rs FederatedSearchResponse): per-source row
    * counts + responded/empty flags as a small DataFrame.
    */
  def stats(sources: Seq[(String, DataFrame)]): DataFrame =
    sources.map { case (name, df) =>
      df.agg(count(lit(1)).as("rows"))
        .select(lit(name).as("source"), col("rows"),
          (col("rows") > 0).as("responded"))
    }.reduce(_ unionByName _)
}
