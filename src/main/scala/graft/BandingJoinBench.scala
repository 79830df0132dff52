package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement main behind the SHUFFLE_HASH hint on the banded dedup
  * self-joins (Dedup.simhashNearDupFromFps / minhashLsh). r16 result at
  * 10M signatures, min of 3: sort-merge 5.6 s vs shuffle-hash 2.0 s
  * (2.8×), identical output; at the 100M opt-in smoke the full pass
  * dropped 1090.7 s → 357.7 s (3.0×) with unchanged shuffle volume
  * (6.45 GB) and identical planted-pair recovery. Kept so a future
  * Spark upgrade can re-validate the hint decision in one run.
  */
object BandingJoinBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("banding-join-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 10000000L
    val planted = 1000L
    val src = when(col("id") >= n, col("id") - n).otherwise(col("id"))
    val baseFp = xxhash64(src)
    val fp = when(col("id") >= n,
        baseFp.bitwiseXOR(call_function("shiftleft", lit(1L),
          pmod(src, lit(64)).cast("int"))))
      .otherwise(baseFp)
    val fps = spark.range(n + planted)
      .select(col("id"), fp.as("fp")).repartition(64)
      .localCheckpoint() // generation outside the timed region

    def banding(hint: Option[String]): DataFrame = {
      val bits = 32
      val keys = fps.select(col("id"), col("fp"),
        posexplode(transform(sequence(lit(0), lit(1)), c =>
          call_function("shiftright", col("fp"), c * lit(bits))
            .bitwiseAND(lit((1L << bits) - 1)))))
        .toDF("id", "fp", "chunk", "ck")
      val right = hint.fold(keys)(h => keys.hint(h))
      keys.as("a").join(right.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
        .filter(col("hamming") <= 1)
        .distinct()
    }

    def time(label: String, hint: Option[String]): Unit = {
      var best = Double.MaxValue
      var count = -1L
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        count = banding(hint).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[banding] $label%-14s min=$best%.1f s pairs=$count")
    }

    banding(Some("SHUFFLE_HASH")).explain("formatted")
    time("sort_merge", None)
    time("shuffle_hash", Some("SHUFFLE_HASH"))
    spark.stop()
  }
}
