package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Multi-modal fusion search (SURVEY.md §2.3; reference:
  * src/indexing/multimodal_fusion.rs:293-460): each document carries one
  * vector column per modality; a query supplies vectors for a subset of
  * modalities and a fused score ranks documents ascending.
  *
  * Per-modality distance is computed only where BOTH sides have the
  * modality at matching dimensionality (multimodal_fusion.rs:370-377 skips
  * otherwise); missing modalities contribute nothing. Fusion strategies
  * (multimodal_fusion.rs:173-186):
  *   - WeightedSum: Σ d·w / Σ w over present modalities (∞ when none);
  *   - MinDistance / MaxDistance across present modalities;
  *   - Rrf: 1 / Σ 1/(60+d) — the reference applies the RRF kernel to the
  *     raw DISTANCES (not ranks), inverted so lower is better
  *     (multimodal_fusion.rs:423-434);
  *   - Concatenate: cosine over the concatenation of the shared modality
  *     vectors. The reference iterates a HashMap (nondeterministic order);
  *     we concatenate in SORTED modality-name order and document the
  *     determinism as deliberate.
  * Non-finite fused scores are dropped (multimodal_fusion.rs:298).
  *
  * Everything is a narrow per-row expression stack feeding one global
  * top-k (TakeOrderedAndProject) — no shuffle beyond the k-row merge, so
  * the operator scales linearly with the scan.
  */
object MultimodalFusion {

  final case class Modality(vecCol: String, metric: String = "cosine",
                            weight: Double = 1.0)

  sealed trait Strategy
  object Strategy {
    case object WeightedSum extends Strategy
    case object MinDistance extends Strategy
    case object MaxDistance extends Strategy
    case object Rrf extends Strategy
    case object Concatenate extends Strategy
  }

  /** Fused top-k. `queries` maps modality name → query vector; per-modality
    * weight overrides (reference: MultiModalQuery.modality_weights) win over
    * the modality's default weight.
    */
  def search(df: DataFrame, idCol: String,
             modalities: Map[String, Modality],
             queries: Map[String, Array[Float]], k: Int,
             strategy: Strategy = Strategy.WeightedSum,
             weightOverrides: Map[String, Double] = Map.empty,
             roundTo: Option[Int] = None): DataFrame = {
    val active = queries.keys.toSeq.sorted.flatMap { name =>
      modalities.get(name).map(m => (name, m, queries(name)))
    }
    require(active.nonEmpty, "query must include at least one known modality")

    // d_<name>: distance where the doc has the modality at the query's
    // dimensionality, else null
    val dists: Seq[(String, Column, Double)] = active.map { case (name, m, q) =>
      val v = col(m.vecCol)
      val d = when(v.isNotNull && size(v) === q.length,
        Distances.distance(m.metric, v, lit(q)))
      (name, d, weightOverrides.getOrElse(name, m.weight))
    }

    val fused: Column = strategy match {
      case Strategy.WeightedSum =>
        val wsum = dists.map { case (_, d, w) =>
          when(d.isNotNull, lit(w)).otherwise(lit(0.0)) }.reduce(_ + _)
        val dsum = dists.map { case (_, d, w) =>
          when(d.isNotNull, d * w).otherwise(lit(0.0)) }.reduce(_ + _)
        when(wsum > 0, dsum / wsum).otherwise(lit(Double.PositiveInfinity))
      case Strategy.MinDistance =>
        if (dists.size == 1) dists.head._2
        else least(dists.map(_._2): _*) // least/greatest skip nulls
      case Strategy.MaxDistance =>
        if (dists.size == 1) dists.head._2
        else greatest(dists.map(_._2): _*)
      case Strategy.Rrf =>
        val rrf = dists.map { case (_, d, _) =>
          when(d.isNotNull, lit(1.0) / (lit(60.0) + d)).otherwise(lit(0.0))
        }.reduce(_ + _)
        when(rrf > 0, lit(1.0) / rrf).otherwise(lit(Double.PositiveInfinity))
      case Strategy.Concatenate =>
        // shared-modality concatenation in sorted-name order
        val qcat = active.flatMap { case (name, m, q) => Seq((name, m, q)) }
        val docCat = qcat.map { case (_, m, q) =>
          when(col(m.vecCol).isNotNull && size(col(m.vecCol)) === q.length,
            col(m.vecCol)).otherwise(array().cast("array<float>"))
        }.reduce(concat(_, _))
        val queryCat = qcat.map { case (_, m, q) =>
          when(col(m.vecCol).isNotNull && size(col(m.vecCol)) === q.length,
            lit(q)).otherwise(array().cast("array<float>"))
        }.reduce(concat(_, _))
        when(size(docCat) > 0, Distances.cosine(docCat, queryCat))
          .otherwise(lit(Double.PositiveInfinity))
    }

    val rawScore = coalesce(fused, lit(Double.PositiveInfinity))
    val score = roundTo.fold(rawScore)(n => round(rawScore, n))
    val perModality = dists.map { case (name, d, _) =>
      roundTo.fold(d)(n => round(d, n)).as(s"d_$name")
    }
    df.withColumn("score", score)
      .filter(!isnan(col("score")) &&
        col("score") < lit(Double.PositiveInfinity))
      .select(Seq(col(idCol), col("score")) ++ perModality: _*)
      .orderBy(col("score").asc, col(idCol).asc)
      .limit(k)
  }
}
