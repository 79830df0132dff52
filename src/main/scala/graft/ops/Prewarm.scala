package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Predictive query pre-warming (reference: src/experimental/
  * query_prewarming.rs) — score past query patterns by temporal
  * similarity to "now" and recency decay, then predict the next queries
  * per collection as score-weighted query-embedding centroids.
  *
  * Spark re-expression: the query history is a DataFrame (collection,
  * embedding, k, ts); prediction is a scored top-candidates pass plus one
  * grouped weighted-centroid aggregation. `now` is an explicit parameter.
  *
  * Reference semantics kept (query_prewarming.rs:202-305, 363-385):
  *   - temporal similarity = 0.7·(1 − circular_hour_diff/12) +
  *     0.3·(1 − circular_day_diff/3.5), day 0 = Thursday (epoch);
  *   - score = temporal_sim · decay^(age_hours);
  *   - the top 3·kNeighbors patterns by score form the candidate pool
  *     (deterministic (score desc, ts desc, collection) order replaces the
  *     reference's unstable sort);
  *   - per collection: centroid weighted by score/total_score, confidence
  *     = min(avg score, 1), avg_k = integer mean; predictions under the
  *     confidence threshold are dropped, remainder ordered by confidence.
  *   - fewer than 3 logged patterns → no predictions (:203-205).
  */
object Prewarm {

  case class Config(kNeighbors: Int = 5, confidenceThreshold: Double = 0.5,
                    decayFactor: Double = 0.95)

  /** (hour_of_day, day_of_week[0=Thursday]) from epoch seconds
    * (query_prewarming.rs:363-368).
    */
  def temporalFeatures(ts: Column): (Column, Column) =
    (((ts % 86400) / 3600).cast("int"),
      ((ts / 86400).cast("long") + 3) % 7)

  /** 0.7·hour + 0.3·day circular similarity (query_prewarming.rs:370-385). */
  def temporalSimilarity(hourA: Column, dayA: Column, hourB: Column,
                         dayB: Column): Column = {
    val hd = abs(hourA - hourB)
    val hourSim = lit(1.0) - least(hd, lit(24) - hd).cast("double") / 12.0
    val dd = abs(dayA - dayB)
    val daySim = lit(1.0) - least(dd, lit(7) - dd).cast("double") / 3.5
    hourSim * 0.7 + daySim * 0.3
  }

  /** Predicted next queries: (collection, predicted_embedding, confidence,
    * avg_k), highest confidence first.
    */
  def predictNext(history: DataFrame, now: Long, limit: Int,
                  config: Config = Config()): DataFrame = {
    val spark = history.sparkSession
    import spark.implicits._
    if (history.limit(3).count() < 3)
      return Seq.empty[(String, Seq[Float], Double, Long)]
        .toDF("collection", "predicted_embedding", "confidence", "avg_k")
    val (nowHour, nowDay) = ((now % 86400) / 3600, (now / 86400 + 3) % 7)
    val (h, d) = temporalFeatures(col("ts"))
    val ageHours = greatest(lit(now.toDouble) - col("ts").cast("double"),
      lit(0.0)) / 3600.0
    val scored = history
      .withColumn("__score",
        temporalSimilarity(lit(nowHour.toInt), lit(nowDay.toInt), h, d) *
          pow(lit(config.decayFactor), ageHours))
      .orderBy(col("__score").desc, col("ts").desc, col("collection"))
      .limit(config.kNeighbors * 3)
    val withTotals = scored
      .withColumn("__total",
        sum(col("__score")).over(Window.partitionBy(col("collection"))))
      .filter(col("__total") >= 1e-10)
    withTotals
      .select(col("collection"), col("__score"), col("__total"), col("k"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("collection"), col("dim"))
      .agg(
        // f64 accumulate, one f32 truncation (the repo's oracle-parity
        // convention for the reference's f32 centroid fold)
        sum(col("x").cast("double") * col("__score") / col("__total"))
          .cast("float").as("c"),
        (sum(col("__score")) / count(lit(1))).as("__conf"),
        floor(sum(col("k")) / count(lit(1))).as("__avg_k"))
      .groupBy(col("collection"))
      .agg(
        map_from_entries(collect_list(struct(col("dim"), col("c"))))
          .as("__cm"),
        max(col("dim")).as("__maxd"),
        first(col("__conf")).as("__conf"), first(col("__avg_k")).as("avg_k"))
      .withColumn("predicted_embedding",
        transform(sequence(lit(0), col("__maxd")), i => element_at(col("__cm"), i)))
      .withColumn("confidence", least(col("__conf"), lit(1.0)))
      .filter(col("confidence") >= config.confidenceThreshold)
      .select(col("collection"), col("predicted_embedding"),
        col("confidence"), col("avg_k"))
      .orderBy(col("confidence").desc, col("collection"))
      .limit(limit)
  }

  /** Hit-rate stats over predictions vs observed next queries: a
    * prediction "hits" when the same collection sees a query within
    * `windowSecs` after `now` (the reference counts record_hit calls —
    * :305-331; this is the batch-log form of the same bookkeeping).
    */
  def hitRate(predictions: DataFrame, history: DataFrame, now: Long,
              windowSecs: Long): DataFrame = {
    val future = history.filter(col("ts") > now && col("ts") <= now + windowSecs)
      .select(col("collection")).distinct()
      .withColumn("__hit", lit(1))
    predictions.select(col("collection"))
      .join(future, Seq("collection"), "left")
      .agg(count(lit(1)).as("total_predictions"),
        sum(coalesce(col("__hit"), lit(0))).as("hits"),
        (sum(coalesce(col("__hit"), lit(0))).cast("double") /
          count(lit(1))).as("hit_rate"))
  }
}
