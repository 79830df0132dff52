package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Thompson-sampling bandits reranker (SURVEY.md §2.5; reference:
  * src/search/reranker.rs:596-816).
  *
  * The reference keeps a per-vector Beta(α,β) posterior in a HashMap,
  * updated per feedback event (α += reward, β += 1−reward over a
  * Beta(1,1) prior), decayed every `decay_interval` events, and reranks
  * by drawing one sample per result with `thread_rng`. The Spark
  * re-expression makes the state a DataFrame and the learning a
  * distributed aggregation:
  *
  *   - params table (id, alpha, beta) = 1 + sum(reward) / 1 + sum(1−reward)
  *     over the feedback log — one groupBy, associative, incremental via
  *     [[updateParams]] merge of batch aggregates (exactly the reference's
  *     per-event fold, reordered by associativity).
  *   - decay (reranker.rs:672-676): α' = 1+(α−1)·f applied per BATCH
  *     boundary rather than per 100 events — a global event ordering is
  *     the one thing a distributed log should not promise, and the
  *     reference's own interval is an arbitrary batching of the stream.
  *   - Thompson sample (reranker.rs:651-663): the reference approximates
  *     Beta sampling as mean + U(−1,1)·stddev. Here the noise term is a
  *     DETERMINISTIC hash of (id, seed) mapped to [−1,1) — same
  *     explore/exploit shape, but reproducible across retries/partitions
  *     (a distributed rerank that changes under task retry would break
  *     exactly-once sinks). The hash is plain integer arithmetic (a
  *     Knuth multiplicative step) so oracle SQL can replay it.
  *
  * A/B testing mode (reranker.rs:765-768): deterministic bucket by query
  * id rather than a coin flip — callers route the control bucket to the
  * unreranked list.
  */
object Bandits {

  /** Aggregate a feedback batch (idCol, rewardCol in [0,1]) into per-id
    * Beta posteriors over the uniform prior: (id, alpha, beta).
    */
  def fitParams(feedback: DataFrame, idCol: String = "id",
                rewardCol: String = "relevance"): DataFrame =
    feedback.groupBy(col(idCol))
      .agg((lit(1.0) + sum(col(rewardCol))).as("alpha"),
        (lit(1.0) + sum(lit(1.0) - col(rewardCol))).as("beta"))

  /** Merge a new feedback batch into an existing params table — the
    * associative regrouping of the reference's per-event updates
    * (reranker.rs:731-737). Posteriors subtract their Beta(1,1) prior
    * before summing so the prior is counted once.
    */
  def updateParams(params: DataFrame, feedback: DataFrame,
                   idCol: String = "id",
                   rewardCol: String = "relevance"): DataFrame = {
    val batch = fitParams(feedback, idCol, rewardCol)
    params.select(col(idCol), col("alpha"), col("beta"))
      .unionByName(batch)
      .groupBy(col(idCol))
      .agg((sum(col("alpha") - 1.0) + 1.0).as("alpha"),
        (sum(col("beta") - 1.0) + 1.0).as("beta"))
  }

  /** Concept-drift decay toward the uniform prior (reranker.rs:672-676). */
  def decay(params: DataFrame, factor: Double): DataFrame =
    params.withColumn("alpha", lit(1.0) + (col("alpha") - 1.0) * factor)
      .withColumn("beta", lit(1.0) + (col("beta") - 1.0) * factor)

  /** Posterior mean α/(α+β) (reranker.rs:666-669). */
  def expectedValue(alpha: Column, beta: Column): Column = alpha / (alpha + beta)

  /** Deterministic stand-in for U(−1,1): a Knuth multiplicative hash of
    * (id, seed) reduced to [−1, 1). Plain integer arithmetic — replayable
    * in ANSI SQL for the oracle gate.
    */
  def noise(id: Column, seed: Long): Column = {
    val h = pmod((id.cast("long") + lit(seed)) * lit(2654435761L), lit(100000L))
    (h.cast("double") / lit(50000.0)) - lit(1.0)
  }

  /** Thompson score = clamp(mean + noise·stddev, 0, 1)
    * (reranker.rs:651-663), on the Beta posterior's mean/variance.
    */
  def thompsonScore(alpha: Column, beta: Column, id: Column,
                    seed: Long): Column = {
    val mean = expectedValue(alpha, beta)
    val variance = (alpha * beta) /
      (pow(alpha + beta, 2) * (alpha + beta + 1.0))
    least(greatest(mean + noise(id, seed) * sqrt(variance), lit(0.0)), lit(1.0))
  }

  /** Rerank a (bounded) result set by Thompson sample, descending
    * (reranker.rs:752-795). Results without feedback history score on the
    * Beta(1,1) prior (mean 0.5), exactly the reference's `unwrap_or_default`.
    * The params table joins in broadcast — it is keyed state, results are
    * k rows.
    */
  def rerank(results: DataFrame, params: DataFrame, seed: Long,
             idCol: String = "id",
             outCol: String = "thompson_score"): DataFrame = {
    val p = broadcast(params.select(col(idCol).as("__pid"),
      col("alpha"), col("beta")))
    results.join(p, results(idCol) === col("__pid"), "left")
      .withColumn("alpha", coalesce(col("alpha"), lit(1.0)))
      .withColumn("beta", coalesce(col("beta"), lit(1.0)))
      .withColumn(outCol,
        thompsonScore(col("alpha"), col("beta"), col(idCol), seed))
      .drop("__pid", "alpha", "beta")
      .orderBy(col(outCol).desc, col(idCol).asc)
  }

  /** Deterministic A/B bucket (reranker.rs:765-768): true → rerank arm. */
  def abBucket(queryId: Column, seed: Long): Column =
    pmod((queryId.cast("long") + lit(seed)) * lit(2654435761L), lit(2L)) === 0

  /** Reranker stats (reranker.rs:797-815): tracked ids + posterior mass. */
  def stats(params: DataFrame): DataFrame =
    params.agg(count(lit(1)).as("unique_vectors_tracked"),
      sum(col("alpha") - 1.0).as("total_reward_mass"),
      sum(col("alpha") + col("beta") - 2.0).as("total_feedback_mass"))
}
