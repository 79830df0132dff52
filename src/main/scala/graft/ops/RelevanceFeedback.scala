package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-loop relevance feedback (reference: src/experimental/
  * relevance_feedback.rs) — implicit/explicit user signals folded into
  * per-collection search-parameter adjustments, guardrail rollback, and
  * A/B variant comparison.
  *
  * Spark re-expression: the reference's FeedbackEngine keeps a per-
  * collection VecDeque of events and folds it on every call; here the
  * feedback log IS a DataFrame (append-only, the natural shape of a click
  * log at scale) and every engine method is one grouped aggregation over
  * it. The reference's `now = SystemTime::now()` becomes an explicit
  * parameter so results are deterministic and oracle-checkable.
  *
  * Signal → relevance score (relevance_feedback.rs:42-57):
  *   thumbs_up 1.0 · thumbs_down −1.0 · click 0.5 ·
  *   dwell clamp((secs−3)/5, −1, 1) · skip −0.3 · rating (r−3)/2.
  *
  * Adjustment math (relevance_feedback.rs:293-343): events are weighted by
  * temporal_decay^(age_hours); ef_search_factor =
  * clamp(1 + lr·(1 − avg_relevance), 0.5, 2.0) — poorly-rated results push
  * recall effort UP; rerank_weight = unweighted positive ratio;
  * confidence = min(n/100, 1).
  *
  * Scale: one shuffle keyed by collection (or variant) — bounded key
  * cardinality, associative aggregates only, safe on a 100 TB click log.
  */
object RelevanceFeedback {

  /** Engine defaults (relevance_feedback.rs:141-152). */
  case class Config(learningRate: Double = 0.01,
                    minEventsForAdjustment: Long = 10L,
                    temporalDecay: Double = 0.95,
                    rollbackThreshold: Double = -0.2)

  /** Map a signal row to its relevance score in [−1, 1]
    * (relevance_feedback.rs:42-57). `signalType` ∈ {thumbs_up, thumbs_down,
    * click, dwell, skip, rating}; `dwellMs` / `rating` are read only for
    * their signal types.
    */
  def relevanceScore(signalType: Column, dwellMs: Column,
                     rating: Column): Column =
    when(signalType === "thumbs_up", 1.0)
      .when(signalType === "thumbs_down", -1.0)
      .when(signalType === "click", 0.5)
      .when(signalType === "dwell",
        least(greatest((dwellMs.cast("double") / 1000.0 - 3.0) / 5.0,
          lit(-1.0)), lit(1.0)))
      .when(signalType === "skip", -0.3)
      .when(signalType === "rating", (rating.cast("double") - 3.0) / 2.0)
      .otherwise(0.0)

  /** Per-collection parameter adjustments (relevance_feedback.rs:293-343).
    * Input: feedback log with (collectionCol, scoreCol, tsCol epoch-secs).
    * Collections under `minEventsForAdjustment` are omitted (the reference
    * returns None). Output: (collection, ef_search_factor, rerank_weight,
    * avg_relevance, event_count, confidence).
    */
  def computeAdjustments(feedback: DataFrame, collectionCol: Column,
                         scoreCol: Column, tsCol: Column, now: Long,
                         config: Config = Config()): DataFrame = {
    val ageHours = (lit(now.toDouble) - tsCol.cast("double")) / 3600.0
    // the reference saturates age at 0 (saturating_sub) — future events
    // weigh as "now"
    val weight = pow(lit(config.temporalDecay), greatest(ageHours, lit(0.0)))
    feedback
      .select(collectionCol.as("collection"), scoreCol.as("s"), weight.as("w"))
      .groupBy(col("collection"))
      .agg(
        (sum(col("s") * col("w")) / sum(col("w"))).as("avg_relevance"),
        (sum(when(col("s") > 0, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("rerank_weight"),
        count(lit(1)).as("event_count"))
      .filter(col("event_count") >= config.minEventsForAdjustment)
      .withColumn("ef_search_factor",
        least(greatest(lit(1.0) + (lit(1.0) - col("avg_relevance")) * config.learningRate,
          lit(0.5)), lit(2.0)))
      .withColumn("confidence",
        least(col("event_count").cast("double") / 100.0, lit(1.0)))
      .select(col("collection"), col("ef_search_factor"), col("rerank_weight"),
        col("avg_relevance"), col("event_count"), col("confidence"))
  }

  /** Guardrail check (relevance_feedback.rs:345-352): collections whose
    * decayed avg relevance fell below the rollback threshold.
    */
  def shouldRollback(feedback: DataFrame, collectionCol: Column,
                     scoreCol: Column, tsCol: Column, now: Long,
                     config: Config = Config()): DataFrame =
    computeAdjustments(feedback, collectionCol, scoreCol, tsCol, now, config)
      .select(col("collection"),
        (col("avg_relevance") < config.rollbackThreshold).as("rollback"))

  /** Per-collection feedback stats (relevance_feedback.rs:364-392):
    * unweighted averages, positive/negative counts, click-through rate.
    */
  def stats(feedback: DataFrame, collectionCol: Column, scoreCol: Column,
            signalTypeCol: Column): DataFrame =
    feedback
      .select(collectionCol.as("collection"), scoreCol.as("s"),
        signalTypeCol.as("t"))
      .groupBy(col("collection"))
      .agg(
        count(lit(1)).as("total_events"),
        sum(when(col("s") > 0, 1L).otherwise(0L)).as("positive_count"),
        sum(when(col("s") < 0, 1L).otherwise(0L)).as("negative_count"),
        avg(col("s")).as("avg_relevance"),
        (sum(when(col("t") === "click", 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("click_through_rate"))

  /** A/B variant report (relevance_feedback.rs:199-241): per-variant event
    * count + avg relevance, `winner` = true on the highest avg relevance
    * among variants with ≥ `minEvents` events (ties → first by variant
    * name, deterministic where the reference's max_by is last-wins on
    * iteration order).
    */
  def abReport(feedback: DataFrame, variantCol: Column, scoreCol: Column,
               minEvents: Long = 10L): DataFrame = {
    val per = feedback.select(variantCol.as("variant"), scoreCol.as("s"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("event_count"), avg(col("s")).as("avg_relevance"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .orderBy(col("eligible").desc, col("avg_relevance").desc,
        col("variant").asc)
    // variant cardinality is tiny by construction — the single-partition
    // window ranks a handful of rows
    per.withColumn("eligible", col("event_count") >= minEvents)
      .withColumn("winner",
        col("eligible") && row_number().over(w) === 1)
      .drop("eligible")
  }
}
