package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Exact global (or per-group) 0-based ranking without a single-partition
  * sort — the distributed replacement for
  * `row_number().over(Window.partitionBy(lit(1)).orderBy(...))`, which
  * funnels the whole input through ONE partition and dies at scale.
  *
  * Shape: range-partition on (keys ++ order) — so a skewed group splits
  * across partitions instead of serializing on one — rank locally per
  * partition with a bounded window, then shift each partition's slice by
  * the driver-collected (group, partition) prefix counts. Driver state is
  * ≤ |groups|·numPartitions rows; the caller guarantees |groups| is
  * bounded (Nil = one global group). Same two-phase pattern as
  * `Sampling.packSequentialScalable`, generalized to grouped ranks.
  */
object DistributedRank {

  /** Ceiling for the derived partition count: driver prefix state is
    * |groups|·numPartitions rows and each partition costs a scheduler
    * round-trip, so the derivation never exceeds this (callers with
    * larger clusters size explicitly).
    */
  val MaxDerivedPartitions: Int = 4096

  /** Partition count when the caller passes `numPartitions <= 0`:
    * max(defaultParallelism, shuffle.partitions), clamped to
    * [[MaxDerivedPartitions]] — both read from config, executing
    * nothing. Deliberately NOT `df.rdd.getNumPartitions`: under AQE
    * (on by default) `Dataset.rdd` finalizes the adaptive plan, which
    * SUBMITS every upstream shuffle stage just to learn a partition
    * count the later `repartitionByRange` cannot reuse — a whole extra
    * execution of the input per call. Callers ranking inputs far wider
    * than the session's parallelism should size `numPartitions`
    * explicitly.
    */
  def derivePartitions(spark: org.apache.spark.sql.SparkSession): Int =
    math.min(MaxDerivedPartitions,
      math.max(spark.sparkContext.defaultParallelism,
        spark.sessionState.conf.numShufflePartitions))

  /** Appends `rankCol` (0-based rank under `order` within each group of
    * `keys`) and `nCol` (group row count) to `df`.
    *
    * The input is pinned with persist(): the counts job and the final
    * pass must observe the same range partitioning. Returns the ranked
    * DataFrame plus a cleanup thunk; callers materialize their
    * (typically aggregated, small) output — e.g. `localCheckpoint(true)`
    * — before invoking cleanup, which unpersists the pinned input. Note
    * that a `localCheckpoint` lands on executor memory spilling to
    * LOCAL DISK: at corpus scale the checkpointed frame occupies disk
    * until released, so callers should checkpoint the (typically
    * reduced) output, never the raw input.
    *
    * `numPartitions <= 0` (the default) derives the range-partition
    * count from the session's parallelism ([[derivePartitions]] — no
    * extra execution of the input; see its scaladoc for why not
    * `df.rdd`).
    */
  def rankedByRange(df: DataFrame, keys: Seq[String], order: Seq[Column],
                    rankCol: String, nCol: String, numPartitions: Int = 0)
      : (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val keyCols = keys.map(col)
    val np =
      if (numPartitions > 0) numPartitions else derivePartitions(spark)
    val parted = df
      .repartitionByRange(np, keyCols ++ order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    // the counts job can fail (input read error, cancellation): release
    // the pin before rethrowing so a failed call leaks nothing
    val counts =
      try parted.groupBy(col("__pid") +: keyCols: _*).count().collect()
      catch { case t: Throwable => parted.unpersist(); throw t }
    if (keys.isEmpty) {
      // global-rank fast path: the prefix offsets key on __pid alone, so
      // they fold into LITERAL maps instead of a parallelize + broadcast
      // join — two fewer jobs per call (matters for per-request surfaces
      // like the dashboard insights read)
      val sorted = counts.sortBy(_.getAs[Int]("__pid"))
      val n = sorted.map(_.getAs[Long]("count")).sum
      val offsets: Map[Int, Long] = sorted.map(_.getAs[Int]("__pid"))
        .zip(sorted.scanLeft(0L)(_ + _.getAs[Long]("count"))).toMap
      val offCol =
        if (offsets.isEmpty) lit(0L)
        else coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L))
      val localRank = row_number().over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)) - 1
      val out = parted
        .withColumn(rankCol, offCol + localRank)
        .withColumn(nCol, lit(n))
        .drop("__pid")
      return (out, () => { parted.unpersist(); () })
    }
    // driver-side prefix scan per group: offset of a partition's slice of
    // the group = rows of that group in all earlier partitions
    val byGroup = counts.groupBy(r => keys.map(k => r.getAs[Any](k)))
    val offRows = byGroup.toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("__pid"))
      val n = sorted.map(_.getAs[Long]("count")).sum
      sorted.zip(sorted.scanLeft(0L)(_ + _.getAs[Long]("count"))).map {
        case (r, off) =>
          Row.fromSeq(
            r.getAs[Int]("__pid") +: keys.map(k => r.getAs[Any](k)) :+ off :+ n)
      }
    }
    val offSchema = StructType(
      StructField("__opid", IntegerType, nullable = false) +:
      keys.map(k => df.schema(k).copy(name = s"__ok_$k")) :+
      StructField("__off", LongType, nullable = false) :+
      StructField("__n_tmp", LongType, nullable = false))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    // null-safe equality: group keys may be nullable (e.g. a nullable k)
    val cond = (parted("__pid") === offDf("__opid")) +:
      keys.map(k => parted(k) <=> offDf(s"__ok_$k"))
    val localRank = row_number().over(
      Window.partitionBy(col("__pid") +: keyCols: _*).orderBy(order: _*)) - 1
    val out = parted.join(broadcast(offDf), cond.reduce(_ && _), "left")
      .withColumn(rankCol, coalesce(col("__off"), lit(0L)) + localRank)
      .withColumn(nCol, coalesce(col("__n_tmp"), lit(0L)))
      .drop("__pid", "__opid", "__off", "__n_tmp")
      .drop(keys.map(k => s"__ok_$k"): _*)
    (out, () => { parted.unpersist(); () })
  }
}
