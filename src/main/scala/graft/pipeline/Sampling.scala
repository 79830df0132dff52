package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling, split assignment, global shuffle and sequence
  * packing for training-data pipelines.
  *
  * Everything here is keyed on md5 of the row id rather than `rand()`:
  * a training pipeline re-run months later on 100 TB must land every
  * document in the SAME split/sample/shuffle position (reproducibility,
  * and no train/test leakage when the corpus is re-processed
  * incrementally). Hex-prefix thresholds make the bucket arithmetic
  * portable to any ANSI engine — the hex alphabet is ordered, so
  * `substr(md5(id),1,w) < '<hex literal>'` is a pure string compare.
  *
  * Scale notes:
  *   - split/sample/stratified: narrow per-row expressions (plus a
  *     per-stratum bounded window for stratified) — scan-speed at 100 TB;
  *   - shuffleRank/packSequential define a GLOBAL order. The window form
  *     is the semantics oracle; `packSequentialScalable` and
  *     `shuffleRankScalable` are the distributed two-phase prefix-sum
  *     twins (range partition → per-partition window → driver-side
  *     partition-offset scan, #partitions rows on the driver) that
  *     compute the identical assignment without a single-partition
  *     window. Both twins have 100k-row row-identical equivalence specs.
  */
object Sampling {

  /** Per-stratum corpus mix report — the data-mixing ledger a training
    * run is planned against: document and token counts, token share of
    * the corpus, and mean quality per (source, lang, …) stratum. One
    * grouped aggregation plus a 1-row broadcast for the shares.
    */
  def mixReport(df: DataFrame, strata: Seq[Column], tokensCol: Column,
                qualityCol: Column): DataFrame = {
    val per = df.groupBy(strata: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(tokensCol.cast("long")).as("n_tokens"),
        round(avg(qualityCol), 6).as("mean_quality"))
    val total = per.agg(sum(col("n_tokens")).as("__total"))
    per.crossJoin(broadcast(total))
      .withColumn("token_share",
        round(col("n_tokens") / col("__total"), 6))
      .drop("__total")
  }

  /** Mixture sampling — the data-mixing counterpart of [[mixReport]]:
    * given target token SHARES per stratum and a total token budget,
    * derive each stratum's sampling fraction (`share·budget / stratum
    * tokens`, capped at 1) and keep a deterministic hash sample at that
    * rate. The thresholds are derived relationally from the data (one
    * grouped aggregation + a broadcast of |strata| rows), so the same
    * statement replays on any ANSI engine; membership is expectation-based
    * (hash sampling), not an exact token-count cut.
    */
  def mixtureSample(df: DataFrame, strataCol: Column, idCol: Column,
                    tokensCol: Column, shares: Map[String, Double],
                    budgetTokens: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.withColumn("__stratum", strataCol)
      .withColumn("__tok", tokensCol.cast("long"))
      .filter(col("__stratum").isin(shares.keys.toSeq: _*))
    val per = base.groupBy(col("__stratum")).agg(sum(col("__tok")).as("__stok"))
    val frac = col("__share") * budgetTokens / col("__stok")
    val thr = per.join(shares.toSeq.toDF("__stratum", "__share"), "__stratum")
      // frac ≥ 1 keeps the whole stratum: 'zzzz' outranks every hex prefix
      // (hex(65536) would be 5 chars and lpad-4 would TRUNCATE it)
      .withColumn("__thr", when(frac >= 1.0, lit("zzzz"))
        .otherwise(lpad(lower(hex(floor(frac * 65536).cast("long"))), 4, "0")))
      .select(col("__stratum"), col("__thr"))
    base.join(broadcast(thr), "__stratum")
      .filter(hashPrefix(idCol, 4) < col("__thr"))
      .drop("__stratum", "__tok", "__thr")
  }

  /** Lowercase hex md5 prefix of an id — the deterministic bucket key. */
  def hashPrefix(idCol: Column, width: Int): Column =
    substring(md5(idCol.cast("string").cast("binary")), 1, width)

  private def hexLit(v: Long, width: Int): String = {
    val s = java.lang.Long.toHexString(v)
    ("0" * (width - s.length)) + s
  }

  /** Quantize a fraction to `16^width` hex buckets (floor). */
  private def threshold(fraction: Double, width: Int): String = {
    val buckets = 1L << (4 * width)
    hexLit(math.min(buckets, math.floor(fraction * buckets).toLong), width)
  }

  /** train/val/test split label, quantized to 1/256 resolution:
    * bucket < floor(256·trainFrac) → train, < floor(256·(train+val)) →
    * val, else test. Disjoint, exhaustive, stable under corpus growth
    * (membership depends only on the id).
    */
  def splitLabel(idCol: Column, trainFrac: Double, valFrac: Double): Column = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      "fractions must be non-negative and sum to at most 1")
    val h = hashPrefix(idCol, 2)
    when(h < lit(threshold(trainFrac, 2)), "train")
      .when(h < lit(threshold(trainFrac + valFrac, 2)), "val")
      .otherwise("test")
  }

  /** Deterministic ~`fraction` sample (1/65536 resolution): keep rows whose
    * 4-hex-char bucket falls below the threshold. Unlike `df.sample`, the
    * same ids are kept on every run and on every engine.
    */
  def sampleByHash(df: DataFrame, idCol: Column, fraction: Double): DataFrame =
    df.filter(hashPrefix(idCol, 4) < lit(threshold(fraction, 4)))

  /** Equal-allocation stratified sample: the first `perStratum` rows of each
    * stratum in deterministic hash order (md5, then id as tie-break). The
    * window is bounded per stratum — no global ordering.
    */
  def stratifiedSample(df: DataFrame, strataCol: Column, idCol: Column,
                       perStratum: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(hashPrefix(idCol, 8), idCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum).drop("__rn")
  }

  /** Global deterministic shuffle position (1-based): rank of
    * md5(seed || ':' || id). Re-keying the hash with the seed gives a fresh
    * independent permutation per epoch — the standard trick for
    * reproducible training-order shuffling.
    *
    * The global window is the oracle form; `shuffleRankScalable` below
    * computes the identical positions with a range partition + partition
    * offsets instead of a single-partition sort.
    */
  def shuffleRank(df: DataFrame, idCol: Column, seed: String): DataFrame = {
    val key = md5(concat(lit(seed + ":"), idCol.cast("string")).cast("binary"))
    df.withColumn("pos",
      row_number().over(Window.orderBy(key, idCol)).cast("long"))
  }

  /** Distributed form of `shuffleRank`: the global-rank fast path of
    * [[graft.ops.DistributedRank.rankedByRange]] over the seeded hash key
    * (range partition → per-partition rank → driver prefix offsets,
    * #partitions rows on the driver). Output is row-identical to
    * `shuffleRank` — same `pos` for every id — with no single-partition
    * global sort anywhere in the plan.
    *
    * `numPartitions <= 0` (the default) derives the partition count from
    * the session's parallelism
    * ([[graft.ops.DistributedRank.derivePartitions]]).
    * The result is `localCheckpoint`ed so it stays valid past the
    * internal unpersist — executor memory spilling to LOCAL DISK, so at
    * corpus scale the shuffled epoch occupies executor disk until the
    * caller releases/garbage-collects it (normal for an epoch-shuffle
    * output, which is consumed within the epoch).
    */
  def shuffleRankScalable(df: DataFrame, idColName: String, seed: String,
                          numPartitions: Int = 0): DataFrame = {
    val key = md5(concat(lit(seed + ":"),
      col(idColName).cast("string")).cast("binary"))
    val (ranked, cleanup) = graft.ops.DistributedRank.rankedByRange(
      df.withColumn("__key", key), Nil,
      Seq(col("__key"), col(idColName)), "__rank0", "__n", numPartitions)
    try {
      val out = ranked
        .withColumn("pos", (col("__rank0") + 1).cast("long"))
        .drop("__key", "__rank0", "__n")
      // materialize before cleanup so callers get a computed plan
      out.localCheckpoint(true)
    } finally cleanup()
  }

  /** Sequential packing: documents in `idCol` order are concatenated and cut
    * into fixed token-budget windows; a document belongs to the window its
    * FIRST token falls in (`floor(tokens-before / budget)`). Single global
    * window — the semantics oracle; see `packSequentialScalable`.
    */
  def packSequential(df: DataFrame, idCol: Column, tokensCol: Column,
                     budget: Int): DataFrame = {
    val before = coalesce(
      sum(tokensCol).over(
        Window.orderBy(idCol).rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    df.withColumn("window_id", floor(before / lit(budget)))
  }

  /** Distributed form of `packSequential`: range-partition on id, compute
    * the running sum per partition, then shift each partition by the total
    * of all earlier partitions (collected to the driver — #partitions rows,
    * bounded). Output is row-identical to `packSequential`.
    *
    * The input is pinned with persist(): the partition totals and the final
    * pass must see the same range partitioning. `numPartitions <= 0` (the
    * default) derives the partition count from the session's parallelism
    * ([[graft.ops.DistributedRank.derivePartitions]]); the output is
    * `localCheckpoint`ed (executor memory spilling to LOCAL DISK — at
    * corpus scale the packed epoch occupies executor disk until the
    * caller releases it).
    */
  def packSequentialScalable(df: DataFrame, idColName: String,
                             tokensCol: Column, budget: Int,
                             numPartitions: Int = 0): DataFrame = {
    val np =
      if (numPartitions > 0) numPartitions
      else graft.ops.DistributedRank.derivePartitions(df.sparkSession)
    val parted = df
      .repartitionByRange(np, col(idColName))
      .withColumn("__tok", tokensCol.cast("long"))
      .withColumn("__pid", spark_partition_id())
      .persist()
    try {
      val totals = parted.groupBy(col("__pid"))
        .agg(sum(col("__tok")).as("t"))
        .collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val offsets: Map[Int, Long] = {
        val sortedPids = totals.keys.toSeq.sorted
        sortedPids.zip(sortedPids.scanLeft(0L)((acc, p) => acc + totals(p))).toMap
      }
      val offsetCol = coalesce(
        element_at(typedLit(offsets), col("__pid")), lit(0L))
      val withinBefore = coalesce(
        sum(col("__tok")).over(
          Window.partitionBy(col("__pid")).orderBy(col(idColName))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L))
      val out = parted
        .withColumn("window_id", floor((offsetCol + withinBefore) / lit(budget)))
        .drop("__tok", "__pid")
      // materialize before unpersist so callers get a computed plan
      out.localCheckpoint(true)
    } finally parted.unpersist()
  }
}
