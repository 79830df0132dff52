package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Agentic memory (reference: src/experimental/agentic_memory.rs) — a
  * typed memory store (short-term / long-term / working / episodic /
  * semantic / procedural) with importance decay, similarity recall,
  * consolidation, promotion, TTL expiry, and capacity eviction.
  *
  * Spark re-expression: the store IS a DataFrame with the reference's
  * Memory fields — (id, memory_type, embedding, content, importance,
  * created_at, last_accessed, access_count) — and every engine method is a
  * DataFrame transform returning either a result set (recall) or the
  * updated store (consolidate / promote / expire / evict), matching the
  * repo's collection-state model (ops.Mutations). The reference's
  * `SystemTime::now()` is an explicit `now` parameter everywhere, so the
  * decay math is deterministic and oracle-checkable.
  *
  * Short-term vs long-term: the reference keeps two HashMaps; here the
  * split is the `memory_type` column — ShortTerm/Working rows play the
  * short-term store's role, everything else is long-term
  * (agentic_memory.rs:417-430).
  *
  * Scale: recall is one scan + TakeOrdered (shuffle-free top-k);
  * consolidation/expiry/eviction are row-local predicates except capacity
  * eviction's per-class rank, which windows by the 2-value store class.
  */
object AgentMemory {

  val shortTermTypes: Seq[String] = Seq("short_term", "working")

  /** Decay functions (agentic_memory.rs:80-124). */
  sealed trait Decay
  object Decay {
    case object NoDecay extends Decay
    case class Exponential(halfLifeHours: Double = 168.0) extends Decay
    case class Linear(ratePerHour: Double) extends Decay
    case class Step(intervalHours: Double, perStep: Double) extends Decay
    case class PowerLaw(exponent: Double) extends Decay
  }

  /** Engine defaults (agentic_memory.rs:162-182). */
  case class Config(decay: Decay = Decay.Exponential(),
                    recallThreshold: Double = 0.5,
                    baseImportance: Double = 1.0,
                    accessBoost: Double = 0.1,
                    consolidationThreshold: Double = 2.0,
                    shortTermTtlSecs: Long = 3600L,
                    shortTermCapacity: Int = 100,
                    longTermCapacity: Int = 10000,
                    maxAssociations: Int = 5,
                    associationThreshold: Double = 0.7)

  /** decay_factor(age_hours) as a Column (agentic_memory.rs:105-124). */
  def decayFactor(decay: Decay, ageHours: Column): Column = decay match {
    case Decay.NoDecay => lit(1.0)
    case Decay.Exponential(hl) => pow(lit(0.5), ageHours / hl)
    case Decay.Linear(r) => greatest(lit(1.0) - ageHours * r, lit(0.0))
    case Decay.Step(interval, per) =>
      greatest(lit(1.0) - floor(ageHours / interval) * per, lit(0.0))
    case Decay.PowerLaw(e) => lit(1.0) / pow(lit(1.0) + ageHours, e)
  }

  /** importance · decay(age) (agentic_memory.rs:285-289); age saturates
    * at 0 for future-dated rows (:276-282 saturating_sub).
    */
  def effectiveImportance(importance: Column, createdAt: Column, now: Long,
                          decay: Decay): Column =
    importance * decayFactor(decay,
      greatest(lit(now.toDouble) - createdAt.cast("double"), lit(0.0)) / 3600.0)

  /** Distance → similarity mapping (agentic_memory.rs:691-699). */
  def similarity(metric: String, vec: Column, query: Column): Column = {
    val d = Distances.distance(metric, vec, query)
    metric match {
      case "cosine"               => lit(1.0) - d
      case "dot"                  => (lit(1.0) + d) / 2.0
      case _                      => lit(1.0) / (lit(1.0) + d)
    }
  }

  /** Recall: similarity-thresholded scan scored by
    * 0.7·similarity + 0.3·effective_importance, descending top-k
    * (agentic_memory.rs:452-524). Output keeps the store columns plus
    * (similarity, effective_importance, relevance).
    */
  def recall(store: DataFrame, query: Array[Float], k: Int, now: Long,
             config: Config = Config(), metric: String = "cosine",
             idCol: String = "id"): DataFrame =
    store
      .withColumn("similarity", similarity(metric, col("embedding"), lit(query)))
      .filter(col("similarity") >= config.recallThreshold)
      .withColumn("effective_importance",
        effectiveImportance(col("importance"), col("created_at"), now, config.decay))
      .withColumn("relevance",
        col("similarity") * 0.7 + col("effective_importance") * 0.3)
      .orderBy(col("relevance").desc, col(idCol).asc)
      .limit(k)

  /** Type-filtered recall keeps the reference's quirk of over-fetching 2k
    * from the full store THEN filtering (agentic_memory.rs:525-539) — a
    * type poorly represented in the global top-2k can return < k rows.
    */
  def recallByType(store: DataFrame, query: Array[Float], memoryType: String,
                   k: Int, now: Long, config: Config = Config()): DataFrame =
    recall(store, query, k * 2, now, config)
      .filter(col("memory_type") === memoryType)
      .limit(k)

  /** Context recall: relevance = (1−tw)·similarity·eff_importance +
    * tw·recency, tw clamped to [0,1] (agentic_memory.rs:935-985).
    */
  def recallWithContext(store: DataFrame, query: Array[Float], k: Int,
                        timeWeight: Double, now: Long,
                        config: Config = Config(),
                        idCol: String = "id"): DataFrame = {
    val tw = math.max(0.0, math.min(1.0, timeWeight))
    val age = greatest(lit(now.toDouble) - col("created_at").cast("double"),
      lit(0.0)) / 3600.0
    store
      .withColumn("similarity", similarity("cosine", col("embedding"), lit(query)))
      .filter(col("similarity") >= config.recallThreshold)
      .withColumn("effective_importance",
        effectiveImportance(col("importance"), col("created_at"), now, config.decay))
      .withColumn("relevance",
        col("similarity") * col("effective_importance") * (1.0 - tw) +
          decayFactor(config.decay, age) * tw)
      .orderBy(col("relevance").desc, col(idCol).asc)
      .limit(k)
  }

  /** Consolidation: ShortTerm rows whose effective importance reaches the
    * threshold become LongTerm (agentic_memory.rs:580-618). Returns the
    * updated store.
    */
  def consolidate(store: DataFrame, now: Long,
                  config: Config = Config()): DataFrame =
    store.withColumn("memory_type",
      when(col("memory_type") === "short_term" &&
        effectiveImportance(col("importance"), col("created_at"), now,
          config.decay) >= config.consolidationThreshold, "long_term")
        .otherwise(col("memory_type")))

  /** Promotion on RAW importance (agentic_memory.rs:900-920). */
  def promoteImportant(store: DataFrame, threshold: Double): DataFrame =
    store.withColumn("memory_type",
      when(col("memory_type") === "short_term" &&
        col("importance") >= threshold, "long_term")
        .otherwise(col("memory_type")))

  /** TTL expiry of short-term rows (agentic_memory.rs:620-641): drops
    * short-term-class rows with now − created_at > ttl.
    */
  def clearExpired(store: DataFrame, now: Long,
                   config: Config = Config()): DataFrame =
    store.filter(!(col("memory_type").isin(shortTermTypes: _*) &&
      lit(now) - col("created_at") > config.shortTermTtlSecs))

  /** Capacity eviction: within each store class keep the top-capacity rows
    * by effective importance (the reference evicts lowest-importance rows
    * one at a time until under capacity — agentic_memory.rs:751-800; the
    * rank form is its batch fixpoint). Ties break by id for determinism.
    */
  def enforceCapacity(store: DataFrame, now: Long,
                      config: Config = Config(),
                      idCol: String = "id"): DataFrame = {
    val cls = when(col("memory_type").isin(shortTermTypes: _*), "short")
      .otherwise("long")
    val w = Window.partitionBy(col("__cls")).orderBy(
      effectiveImportance(col("importance"), col("created_at"), now,
        config.decay).desc, col(idCol).asc)
    store.withColumn("__cls", cls)
      .withColumn("__keep_rank", row_number().over(w))
      .filter(col("__keep_rank") <=
        when(col("__cls") === "short", config.shortTermCapacity)
          .otherwise(config.longTermCapacity))
      .drop("__cls", "__keep_rank")
  }

  /** Associations for a batch of new memories: for each new row, the
    * long-term rows with similarity ≥ threshold, top-`maxAssociations`
    * (agentic_memory.rs:701-724). New rows are the small side — broadcast.
    * Output: (new_id, associated_id, similarity).
    */
  def associate(store: DataFrame, newRows: DataFrame, now: Long,
                config: Config = Config(), idCol: String = "id"): DataFrame = {
    val lt = store.filter(!col("memory_type").isin(shortTermTypes: _*))
      .select(col(idCol).as("associated_id"), col("embedding").as("__lt_emb"))
    val nw = broadcast(newRows.select(col(idCol).as("new_id"),
      col("embedding").as("__new_emb")))
    val w = Window.partitionBy(col("new_id"))
      .orderBy(col("similarity").desc, col("associated_id").asc)
    lt.join(nw, col("associated_id") =!= col("new_id"))
      .withColumn("similarity",
        lit(1.0) - Distances.distance("cosine", col("__lt_emb"), col("__new_emb")))
      .filter(col("similarity") >= config.associationThreshold)
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= config.maxAssociations)
      .select(col("new_id"), col("associated_id"), col("similarity"))
  }

  /** Access bookkeeping for recalled ids: bump access_count, stamp
    * last_accessed, boost importance (agentic_memory.rs:726-734).
    * `recalled` carries the idCol of the rows that were returned.
    */
  def markAccessed(store: DataFrame, recalled: DataFrame, now: Long,
                   config: Config = Config(), idCol: String = "id"): DataFrame = {
    val hit = broadcast(recalled.select(col(idCol).as("__hit_id")).distinct())
    store.join(hit, store(idCol) === col("__hit_id"), "left")
      .withColumn("importance",
        when(col("__hit_id").isNotNull, col("importance") + config.accessBoost)
          .otherwise(col("importance")))
      .withColumn("access_count",
        when(col("__hit_id").isNotNull, col("access_count") + 1)
          .otherwise(col("access_count")))
      .withColumn("last_accessed",
        when(col("__hit_id").isNotNull, lit(now)).otherwise(col("last_accessed")))
      .drop("__hit_id")
  }

  /** Store stats (agentic_memory.rs:330-350): counts per class + total. */
  def stats(store: DataFrame): DataFrame =
    store.agg(
      count(lit(1)).as("total_memories"),
      sum(when(col("memory_type") === "short_term", 1L).otherwise(0L))
        .as("short_term_count"),
      sum(when(col("memory_type") === "working", 1L).otherwise(0L))
        .as("working_memory_count"),
      sum(when(!col("memory_type").isin(shortTermTypes: _*), 1L).otherwise(0L))
        .as("long_term_count"))
}
