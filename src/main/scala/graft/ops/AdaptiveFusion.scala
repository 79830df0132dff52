package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Rrf

/** Adaptive hybrid-search fusion with feedback learning (reference:
  * src/hybrid.rs AdaptiveFusion :812-1000). Weights per query TYPE
  * (keyword/semantic/mixed — Extras.classify) start at the rule-based
  * presets and converge toward position-weighted averages of the weights
  * that produced relevant results:
  *
  *   - positive feedback: `sums += used_weights · 1/(position+1)`,
  *     `samples += 1` (top positions teach more);
  *   - negative feedback: `sums -= used_weights · learning_rate`,
  *     clamped ≥ 0, samples unchanged, applied only once samples > 0;
  *   - lookup: below `minSamples` → preset; above → blend at
  *     `min(samples/(samples+minSamples), 0.8)` then normalize.
  *
  * All deterministic arithmetic — the "learning" needs no external model.
  * Feedback is human-interaction-scale (clicks), so state lives on the
  * driver like the reference's HashMap; [[recordBatch]] replays a
  * feedback DataFrame in explicit order (the negative-clamp makes updates
  * order-dependent, so order is part of the contract).
  */
final class AdaptiveFusion(val base: Rrf.Config = Rrf.Config.default,
                           learningRate: Double = 0.1,
                           minSamples: Int = 10) {

  final case class Feedback(query: String, relevant: Boolean, position: Int,
                            vectorWeight: Double, bm25Weight: Double)
  private final class Learned {
    var vSum = 0.0; var bSum = 0.0; var samples = 0
  }

  private val learned = mutable.HashMap[String, Learned]()
  var adaptiveEnabled: Boolean = true

  private def typeKey(query: String): String =
    Extras.classify(Extras.extractFeatures(query)).toString

  /** Fusion weights for this query (hybrid.rs get_weights). */
  def weightsFor(query: String): Rrf.Config = {
    if (!adaptiveEnabled) return base
    val key = typeKey(query)
    val preset = Extras.weightsFor(
      Extras.classify(Extras.extractFeatures(query)))
    val (v, b) = learned.get(key).filter(_.samples >= minSamples) match {
      case Some(l) =>
        val avgV = l.vSum / l.samples
        val avgB = l.bSum / l.samples
        val blend = math.min(l.samples.toDouble / (l.samples + minSamples), 0.8)
        (preset.vectorWeight * (1 - blend) + avgV * blend,
          preset.bm25Weight * (1 - blend) + avgB * blend)
      case None => (preset.vectorWeight, preset.bm25Weight)
    }
    val total = v + b
    Rrf.Config(k = base.k, vectorWeight = v / total, bm25Weight = b / total)
  }

  /** Record one feedback event (hybrid.rs record_feedback). */
  def recordFeedback(f: Feedback): Unit = {
    val l = learned.getOrElseUpdate(typeKey(f.query), new Learned)
    if (f.relevant) {
      val pw = 1.0 / (f.position + 1.0)
      l.vSum += f.vectorWeight * pw
      l.bSum += f.bm25Weight * pw
      l.samples += 1
    } else if (l.samples > 0) {
      l.vSum = math.max(0.0, l.vSum - f.vectorWeight * learningRate)
      l.bSum = math.max(0.0, l.bSum - f.bm25Weight * learningRate)
    }
  }

  /** Replay a feedback DataFrame (query, relevant, position,
    * vector_weight, bm25_weight) in `orderCol` order. Negative updates
    * clamp at zero, so replay order is semantic — an explicit sequence
    * column is required rather than assumed.
    */
  def recordBatch(df: DataFrame, orderCol: String): Unit =
    df.orderBy(col(orderCol))
      .select(col("query"), col("relevant"), col("position"),
        col("vector_weight"), col("bm25_weight"))
      .collect() // click-scale data: thousands of rows, not table-scale
      .foreach { r =>
        // numeric widening: callers naturally produce Int or Long
        // positions and Float or Double weights
        recordFeedback(Feedback(r.getString(0), r.getBoolean(1),
          r.get(2).asInstanceOf[Number].intValue,
          r.get(3).asInstanceOf[Number].doubleValue,
          r.get(4).asInstanceOf[Number].doubleValue))
      }

  /** Adaptive search: fuse the two ranked lists with this query's learned
    * config (hybrid.rs adaptive search :941). Returns the fused frame and
    * the config used, so callers can attach it to feedback.
    */
  def search(query: String, vectorTop: DataFrame, bm25Top: DataFrame,
             limit: Int): (DataFrame, Rrf.Config) = {
    val cfg = weightsFor(query)
    (Rrf.fuse(vectorTop, bm25Top, cfg, limit), cfg)
  }

  final case class TypeStats(samples: Int, avgVectorWeight: Double,
                             avgBm25Weight: Double)
  final case class Stats(totalFeedback: Int, byType: Map[String, TypeStats])

  def stats: Stats = Stats(
    learned.values.map(_.samples).sum,
    learned.collect { case (k, l) if l.samples > 0 =>
      val avgV = l.vSum / l.samples; val avgB = l.bSum / l.samples
      val t = avgV + avgB
      k -> TypeStats(l.samples,
        if (t > 0) avgV / t else 0.5, if (t > 0) avgB / t else 0.5)
    }.toMap)

  def reset(): Unit = learned.clear()

  /** Persistence as a line format (`type,vSum,bSum,samples`), matching
    * the reference's export/import round-trip contract.
    */
  def exportWeights(): String =
    learned.map { case (k, l) => s"$k,${l.vSum},${l.bSum},${l.samples}" }
      .toSeq.sorted.mkString("\n")

  def importWeights(data: String): Unit = {
    learned.clear()
    data.split("\n").filter(_.nonEmpty).foreach { line =>
      val p = line.split(",")
      val l = new Learned
      l.vSum = p(1).toDouble; l.bSum = p(2).toDouble; l.samples = p(3).toInt
      learned(p(0)) = l
    }
  }
}
