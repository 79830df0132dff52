package graft

import graft.ops.Federated
import graft.ops.Federated.Strategy

/** Randomized differential for the federated merger algebra: random
  * per-source ranked lists (overlapping ids, duplicate distances to
  * force tie-breaks, weights, an occasional empty source) run through
  * ALL FIVE strategies and compared to a plain-Scala model of the
  * reference semantics (merger.rs:53-165) — per-source rank by
  * ascending (distance, id); distance/priority merges keep the
  * best-distance occurrence (source-index tie-break) and order by
  * (distance, id); RRF sums 1/(60+rank) and orders by (score desc,
  * id); first-response takes the lowest-indexed NON-EMPTY source;
  * consensus counts occurrences and averages distance. Complements
  * FederatedSpec's pointwise cases with tie-break-heavy random inputs.
  */
class FederatedDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private type Row = (String, Double) // (id, distance)

  private def rank(rows: Seq[Row]): Seq[(Row, Int)] =
    rows.sortBy { case (id, d) => (d, id) }.zipWithIndex
      .map { case (r, i) => (r, i + 1) }

  for (seed <- Seq(11, 1234))
    test(s"five merge strategies match the model on random ranked " +
        s"lists (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      (1 to 6).foreach { round =>
        val nSources = 2 + rnd.nextInt(3)
        val ids = (0 until 12).map(i => s"v$i")
        // quantized distances: duplicates guaranteed → tie-breaks hit
        val sources = (0 until nSources).map { s =>
          val n = if (round == 3 && s == 0) 0 else 3 + rnd.nextInt(6)
          val rows: Seq[Row] = rnd.shuffle(ids).take(n)
            .map(id => (id, rnd.nextInt(8) / 4.0))
          (s"src$s", rows)
        }
        val weights = sources.map { case (n, _) =>
          n -> (1 + rnd.nextInt(3)).toDouble }.toMap
        val k = 1 + rnd.nextInt(10)
        val dfs = sources.map { case (n, rows) =>
          (n, rows.toDF("id", "distance")) }

        def run(st: Strategy, w: Map[String, Double] = Map.empty) =
          Federated.merge(dfs, k, st, weights = w).select("id", "distance")
            .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

        // pooled model rows: (id, dist, sourceIdx, perSourceRank)
        val pooled = sources.zipWithIndex.flatMap { case ((_, rows), si) =>
          rank(rows).map { case ((id, d), rk) => (id, d, si, rk) }
        }
        def bestPerId(rows: Seq[(String, Double, Int, Int)]) =
          rows.groupBy(_._1).map { case (id, occ) =>
            val b = occ.minBy(o => (o._2, o._3))
            (id, b._2)
          }.toSeq

        // DistanceBased
        assert(run(Strategy.DistanceBased) ==
          bestPerId(pooled).sortBy { case (id, d) => (d, id) }.take(k),
          s"distance round $round")
        // PriorityWeighted: divide by the source's weight BEFORE dedup
        val weighted = pooled.map { case (id, d, si, rk) =>
          (id, d / weights(sources(si)._1), si, rk) }
        assert(run(Strategy.PriorityWeighted, weights) ==
          bestPerId(weighted).sortBy { case (id, d) => (d, id) }.take(k),
          s"priority round $round")
        // ReciprocalRankFusion: payload distance is the best occurrence
        val rrf = pooled.groupBy(_._1).map { case (id, occ) =>
          (id, occ.map(o => 1.0 / (60.0 + o._4)).sum,
            occ.minBy(o => (o._2, o._3))._2)
        }.toSeq
        assert(run(Strategy.ReciprocalRankFusion) ==
          rrf.sortBy { case (id, s, _) => (-s, id) }.take(k)
            .map { case (id, _, d) => (id, d) },
          s"rrf round $round")
        // FirstResponse: lowest-indexed non-empty source only
        val first = sources.indexWhere(_._2.nonEmpty)
        assert(run(Strategy.FirstResponse) ==
          sources(first)._2.sortBy { case (id, d) => (d, id) }.take(k),
          s"first round $round")
        // Consensus: count desc, avg distance asc, id asc
        val cons = pooled.groupBy(_._1).map { case (id, occ) =>
          (id, occ.size, occ.map(_._2).sum / occ.size) }.toSeq
        assert(run(Strategy.Consensus) ==
          cons.sortBy { case (id, c, d) => (-c, d, id) }.take(k)
            .map { case (id, _, d) => (id, d) },
          s"consensus round $round")
      }
    }
}
