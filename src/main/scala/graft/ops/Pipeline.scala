package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.filter.{Filter, FilterCompiler}
import graft.functions.Distances

/** Time-decay functions (reference: src/collection/pipeline.rs:180-228).
  * Factors are in [0,1]; 1 = no decay. Computed in f64 (the reference uses
  * f32 — a documented, semantically-irrelevant widening).
  */
sealed trait TimeDecay {
  /** Decay factor for an age (seconds, non-negative). */
  def factor(age: Column): Column
}
object TimeDecay {
  /** `exp(-ln2/half_life * age)`; half_life 0 ⇒ 1 at age 0 else 0. */
  final case class Exponential(halfLifeSeconds: Long) extends TimeDecay {
    def factor(age: Column): Column =
      if (halfLifeSeconds == 0L) when(age === 0, 1.0).otherwise(0.0)
      else exp(age * lit(-math.log(2.0) / halfLifeSeconds))
  }
  /** `max(0, 1 - age/max_age)`; max_age 0 ⇒ 0. */
  final case class Linear(maxAgeSeconds: Long) extends TimeDecay {
    def factor(age: Column): Column =
      if (maxAgeSeconds == 0L) lit(0.0)
      else when(age >= maxAgeSeconds, 0.0)
        .otherwise(lit(1.0) - age / lit(maxAgeSeconds.toDouble))
  }
  /** 1 within the window (inclusive), else 0. */
  final case class Step(windowSeconds: Long) extends TimeDecay {
    def factor(age: Column): Column =
      when(age <= windowSeconds, 1.0).otherwise(0.0)
  }
  /** `exp(-age²/(2σ²))` — the NeedleQL-layer `TIME_DECAY(gaussian, ...)`
    * function (reference grammar: src/search/query_lang/ast.rs:64-70; the
    * embedded pipeline itself only ships the three above).
    */
  final case class Gaussian(sigmaSeconds: Long) extends TimeDecay {
    def factor(age: Column): Column =
      if (sigmaSeconds == 0L) when(age === 0, 1.0).otherwise(0.0)
      else exp(-(age * age) / lit(2.0 * sigmaSeconds.toDouble * sigmaSeconds))
  }
}

/** Fluent search pipeline (SURVEY.md §2.3; reference:
  * src/collection/pipeline.rs:233-412, execute order :414-447).
  *
  * Stage order is fixed exactly as the reference executes it:
  *   TTL-lazy-filter → as_of filter → pre-filter → top-k fetch
  *   (k × post_filter_factor when a post-filter is set) → post-filter →
  *   truncate k → time-decay re-rank of the surviving ≤k rows → truncate k.
  *
  * Two faithful quirks: (1) the decay re-ranks only the already-truncated
  * top-k (reference applies `apply_post_filter`'s truncate before
  * `apply_time_decay`); (2) a zero decay factor sets distance to f32::MAX
  * rather than dropping the row. The reference's filter_oversampling ×10 is
  * an ANN-recall workaround and does not exist on the exact path (this IS
  * the brute_force_search semantics, the reference's own oracle).
  *
  * Scale: every stage is a narrow filter over one scan except the top-k,
  * which plans as TakeOrderedAndProject (per-partition bounded heaps, no
  * full shuffle). The decay re-rank touches ≤k rows.
  */
final case class SearchBuilder(
    df: DataFrame,
    query: Column,
    vecCol: Column,
    idCol: Column,
    k: Int = 10,
    metric: String = "cosine",
    preFilter: Option[Filter] = None,
    postFilter: Option[Filter] = None,
    postFilterFactor: Int = 3,
    includeCols: Seq[String] = Nil,
    asOf: Option[Long] = None,
    decay: Option[TimeDecay] = None,
    insertedAtCol: Option[Column] = None,
    ttlExpiresAtCol: Option[Column] = None,
    nowEpochS: Option[Long] = None,
    roundDistanceTo: Option[Int] = None) {

  def withK(n: Int): SearchBuilder = copy(k = n)
  def withMetric(m: String): SearchBuilder = copy(metric = m)
  def withFilter(f: Filter): SearchBuilder = copy(preFilter = Some(f))
  def withFilter(json: String): SearchBuilder = withFilter(Filter.parse(json))
  def withPostFilter(f: Filter, factor: Int = 3): SearchBuilder =
    copy(postFilter = Some(f), postFilterFactor = factor)
  def withPostFilter(json: String): SearchBuilder = withPostFilter(Filter.parse(json))
  def withAsOf(ts: Long): SearchBuilder = copy(asOf = Some(ts))
  def withTimeDecay(d: TimeDecay): SearchBuilder = copy(decay = Some(d))
  /** `max_age` sugar = Step decay (reference: pipeline.rs:404-411). */
  def withMaxAge(seconds: Long): SearchBuilder =
    withTimeDecay(TimeDecay.Step(seconds))
  def withNow(epochSeconds: Long): SearchBuilder = copy(nowEpochS = Some(epochSeconds))
  def include(cols: String*): SearchBuilder = copy(includeCols = cols)

  /** f32::MAX — the reference's sentinel for fully-decayed results. */
  private val F32Max = Float.MaxValue.toDouble

  def execute(): DataFrame = {
    val now: Column = nowEpochS.map(n => lit(n)).getOrElse(unix_timestamp())

    // 1. lazy TTL expiration (reference: pipeline.rs:502-513)
    val afterTtl = ttlExpiresAtCol match {
      case Some(ttl) => df.filter(ttl.isNull || ttl > now)
      case None      => df
    }
    // 2. as_of: inserted_at <= ts, rows without a timestamp pass
    //    (reference: pipeline.rs:515-531 map_or(true))
    val afterAsOf = (asOf, insertedAtCol) match {
      case (Some(ts), Some(ins)) => afterTtl.filter(ins.isNull || ins <= ts)
      case _                     => afterTtl
    }
    // 3. pre-filter (metadata filter)
    val afterPre = preFilter match {
      case Some(f) => afterAsOf.filter(FilterCompiler.compile(f, df))
      case None    => afterAsOf
    }
    // 4. distance + bounded fetch
    val rawDist = Distances.distance(metric, vecCol, query)
    val dist = roundDistanceTo.fold(rawDist)(n => round(rawDist, n))
    val scored = afterPre.withColumn("distance", dist)
    val fetch = k * (if (postFilter.isDefined) math.max(postFilterFactor, 1) else 1)
    val fetched = scored
      .orderBy(col("distance").asc, idCol.asc)
      .limit(fetch)
    // 5. post-filter then truncate to k (reference: pipeline.rs:597-615)
    val afterPost = postFilter match {
      case Some(f) => fetched.filter(FilterCompiler.compile(f, df))
        .orderBy(col("distance").asc, idCol.asc).limit(k)
      case None => fetched.orderBy(col("distance").asc, idCol.asc).limit(k)
    }
    // 6. time-decay re-rank of the surviving <=k rows
    //    (reference: pipeline.rs:617-655)
    val decayed = (decay, insertedAtCol) match {
      case (Some(d), Some(ins)) =>
        val age = greatest(now - coalesce(ins, lit(0L)), lit(0L))
        val factor = d.factor(age)
        afterPost
          .withColumn("distance",
            when(factor > 0.0, col("distance") / factor).otherwise(F32Max))
          .orderBy(col("distance").asc, idCol.asc)
          .limit(k)
      case _ => afterPost
    }
    decayed.select((idCol +: col("distance") +: includeCols.map(col)): _*)
  }
}
