package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal vector sequences (reference: src/experimental/
  * temporal_sequences.rs) — time-series trajectories of embeddings with
  * windowed centroids, trend vectors, drift detection, and trajectory
  * similarity search (DTW / discrete Fréchet / centroid distance).
  *
  * Spark re-expression: a "SequenceStore" is a DataFrame of
  * (seqId, ts, vector) rows — sequences are groups, not in-memory structs,
  * so every per-sequence statistic is a grouped aggregation that scales
  * with the number of sequences. The reference keeps each sequence sorted
  * in a Vec (temporal_sequences.rs:57-73); here order is imposed per
  * operator with a (ts, …) sort key, and "index within sequence" is a
  * `row_number` window partitioned BY SEQUENCE — bounded per-group, never
  * a global sort.
  *
  * Numeric contract (matches the repo-wide oracle convention): centroids
  * are f64-accumulated then truncated to f32 (the reference accumulates in
  * f32 — temporal_sequences.rs:116-133 — which no distributed fold should
  * reproduce bit-for-bit; the f32 truncation keeps reported values in the
  * reference's precision class), and distances between centroids are f64
  * (euclidean_dist casts to f64, :268-274).
  *
  * Scale: centroid/trend/drift shuffle on (seq, dim) — bounded keys, no
  * skew beyond sequence length. Trajectory search materializes ONE array
  * per sequence (capped at [[maxTrajectoryLen]] most-recent entries) and
  * runs an O(|query|·|seq|) DP per sequence, embarrassingly parallel
  * across sequences; the query trajectory ships in the UDF closure
  * (broadcast-sized by contract — it is a user-provided literal).
  */
object Temporal {

  /** Trajectory-distance methods (temporal_sequences.rs:193-204). */
  sealed trait TrajectoryDistance
  object TrajectoryDistance {
    case object Dtw extends TrajectoryDistance
    case object Frechet extends TrajectoryDistance
    case object CentroidDistance extends TrajectoryDistance
  }

  /** Drift-detection methods (temporal_sequences.rs:277-286). All three
    * reference implementations reduce to centroid comparisons (":325-351" —
    * KL is "approximated" by centroid euclidean, MMD by its square).
    */
  sealed trait DriftMethod
  object DriftMethod {
    case object KlDivergence extends DriftMethod
    case object Mmd extends DriftMethod
    case object CosineDrift extends DriftMethod
  }

  /** Hard cap on entries per sequence entering the trajectory DP — the
    * most-recent entries win, mirroring a bounded-window trajectory. DTW is
    * O(|q|·n) per sequence; an unbounded sequence would make one task
    * quadratic at 100 TB.
    */
  val maxTrajectoryLen = 4096

  // ------------------------------------------------------------- centroids

  /** Per-sequence centroid as (seq, dim, value) — f64 accumulate, f32
    * truncate (temporal_sequences.rs:116-133). `dim` is 0-based.
    */
  def centroids(df: DataFrame, seqCol: Column, vecCol: Column): DataFrame =
    df.select(seqCol.as("seq"), posexplode(vecCol).as(Seq("dim", "x")))
      .groupBy(col("seq"), col("dim"))
      .agg(avg(col("x").cast("double")).cast("float").as("value"))

  /** Centroid over a closed time window [start, end]
    * (temporal_sequences.rs:134-149 — `range` is inclusive both ends).
    */
  def windowCentroids(df: DataFrame, seqCol: Column, tsCol: Column,
                      vecCol: Column, start: Long, end: Long): DataFrame =
    centroids(df.filter(tsCol >= start && tsCol <= end), seqCol, vecCol)

  /** Trend direction = centroid(last `windowSize`) − centroid(first
    * `windowSize`) per sequence (temporal_sequences.rs:153-178). Sequences
    * with fewer than 2·windowSize entries are omitted (the reference
    * returns None). Output (seq, dim, delta); the subtraction runs on the
    * f32-truncated window centroids, like the reference's f32 arithmetic.
    */
  def trend(df: DataFrame, seqCol: Column, tsCol: Column, vecCol: Column,
            windowSize: Int): DataFrame = {
    val w = Window.partitionBy(col("seq")).orderBy(col("ts"))
    val ranked = df.select(seqCol.as("seq"), tsCol.as("ts"), vecCol.as("vec"))
      .withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("seq"))))
      .filter(col("n") >= 2 * windowSize)
    ranked.select(col("seq"), col("rnk"), col("n"),
        posexplode(col("vec")).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
      .groupBy(col("seq"), col("dim"))
      .agg(
        avg(when(col("rnk") <= windowSize, col("x"))).cast("float").as("first_c"),
        avg(when(col("rnk") > col("n") - windowSize, col("x"))).cast("float").as("last_c"))
      .select(col("seq"), col("dim"),
        (col("last_c").cast("double") - col("first_c").cast("double")).as("delta"))
  }

  // ----------------------------------------------------------------- drift

  /** Midpoint drift detection (temporal_sequences.rs:305-365): window A =
    * the `windowSize` entries before the sequence midpoint, window B = the
    * `windowSize` after; score compares the two window centroids by
    * `method`. Sequences with fewer than 2·windowSize entries are omitted.
    * Output: (seq, score, drift_detected, window_a_start, window_b_end).
    */
  def detectDrift(df: DataFrame, seqCol: Column, tsCol: Column,
                  vecCol: Column, method: DriftMethod, windowSize: Int,
                  threshold: Double): DataFrame = {
    val w = Window.partitionBy(col("seq")).orderBy(col("ts"))
    val ranked = df.select(seqCol.as("seq"), tsCol.as("ts"), vecCol.as("vec"))
      .withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("seq"))))
      .filter(col("n") >= 2 * windowSize)
      // mid = n/2 (integer); 1-based ranks: A = (mid-w, mid], B = (mid, mid+w]
      .withColumn("mid", (col("n") / 2).cast("int"))
      .withColumn("win",
        when(col("rnk") > col("mid") - windowSize && col("rnk") <= col("mid"), "a")
          .when(col("rnk") > col("mid") && col("rnk") <= col("mid") + windowSize, "b"))
    // window boundary timestamps come from the un-exploded level
    val bounds = ranked.groupBy(col("seq")).agg(
      min(when(col("rnk") === col("mid") - windowSize + 1, col("ts"))).as("window_a_start"),
      max(when(col("rnk") === col("mid") + windowSize, col("ts"))).as("window_b_end"))
    val cent = ranked.filter(col("win").isNotNull)
      .select(col("seq"), col("win"), posexplode(col("vec")).as(Seq("dim", "x")))
      .groupBy(col("seq"), col("dim"))
      .agg(
        avg(when(col("win") === "a", col("x").cast("double"))).cast("float")
          .cast("double").as("ca"),
        avg(when(col("win") === "b", col("x").cast("double"))).cast("float")
          .cast("double").as("cb"))
    val perSeq = cent.groupBy(col("seq")).agg(
      sum((col("ca") - col("cb")) * (col("ca") - col("cb"))).as("sq"),
      sum(col("ca") * col("cb")).as("dot"),
      sqrt(sum(col("ca") * col("ca"))).as("mag_a"),
      sqrt(sum(col("cb") * col("cb"))).as("mag_b"))
    val score = method match {
      case DriftMethod.KlDivergence => sqrt(col("sq"))
      case DriftMethod.Mmd          => col("sq")
      case DriftMethod.CosineDrift =>
        when(col("mag_a") < 1e-10 || col("mag_b") < 1e-10, lit(1.0))
          .otherwise(lit(1.0) - col("dot") / (col("mag_a") * col("mag_b")))
    }
    perSeq.withColumn("score", score)
      .withColumn("drift_detected", col("score") > threshold)
      .join(bounds, "seq")
      .select(col("seq"), col("score"), col("drift_detected"),
        col("window_a_start"), col("window_b_end"))
  }

  // --------------------------------------------------- trajectory kernels

  private def euclid(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0; val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    math.sqrt(s)
  }

  /** The UDF hands back boxed Seq[Seq[Float]]; one conversion pass to
    * primitive arrays keeps the O(n·m·dim) DP unbox-free.
    */
  private def toArr(x: Seq[Seq[Float]]): Array[Array[Float]] =
    x.iterator.map(_.toArray).toArray

  /** Dynamic Time Warping distance (temporal_sequences.rs:206-226):
    * dp[i][j] = cost(i,j) + min(dp[i-1][j], dp[i][j-1], dp[i-1][j-1]),
    * rolling-row DP, O(min(n,m)) memory.
    */
  def dtw(a: Seq[Seq[Float]], b: Seq[Seq[Float]]): Double =
    dtwArr(toArr(a), toArr(b))

  private[ops] def dtwArr(a: Array[Array[Float]], b: Array[Array[Float]]): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.MaxValue
    var prev = Array.fill(m + 1)(Double.MaxValue)
    var curr = new Array[Double](m + 1)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      curr(0) = Double.MaxValue
      var j = 1
      while (j <= m) {
        val cost = euclid(a(i - 1), b(j - 1))
        val best = math.min(prev(j), math.min(curr(j - 1), prev(j - 1)))
        curr(j) = if (best == Double.MaxValue) Double.MaxValue else cost + best
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  /** Discrete Fréchet distance (temporal_sequences.rs:227-266): the
    * reference's memoized recursion unrolled to the standard iterative DP —
    * dp[i][j] = max(d(i,j), min(dp[i-1][j], dp[i][j-1], dp[i-1][j-1]))
    * with first-row/column chaining.
    */
  def frechet(a: Seq[Seq[Float]], b: Seq[Seq[Float]]): Double =
    frechetArr(toArr(a), toArr(b))

  private[ops] def frechetArr(a: Array[Array[Float]], b: Array[Array[Float]]): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.MaxValue
    var prev = new Array[Double](m)
    var curr = new Array[Double](m)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        val d = euclid(a(i), b(j))
        curr(j) =
          if (i == 0 && j == 0) d
          else if (i == 0) math.max(d, curr(j - 1))
          else if (j == 0) math.max(d, prev(0))
          else math.max(d, math.min(prev(j), math.min(curr(j - 1), prev(j - 1))))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m - 1)
  }

  // --------------------------------------------------- trajectory search

  /** Per-sequence trajectory as an ordered array column:
    * (seq, trajectory ARRAY&lt;ARRAY&lt;FLOAT&gt;&gt;), capped to the
    * [[maxTrajectoryLen]] most-recent entries.
    */
  def trajectories(df: DataFrame, seqCol: Column, tsCol: Column,
                   vecCol: Column): DataFrame =
    df.select(seqCol.as("seq"), struct(tsCol.as("ts"), vecCol.as("vec")).as("e"))
      .groupBy(col("seq"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("seq"),
        // negative-start slice on a shorter-than-cap array is out of range
        when(size(col("es.vec")) <= maxTrajectoryLen, col("es.vec"))
          .otherwise(slice(col("es.vec"), -maxTrajectoryLen, maxTrajectoryLen))
          .as("trajectory"))

  /** Trajectory similarity search (temporal_sequences.rs:415-447): rank
    * stored sequences by trajectory distance to `query`, ascending top-k.
    * `excludeSeq` mirrors the reference's `id != query.id` self-exclusion;
    * pass None to rank the query's own sequence too (a planted-duplicate
    * check exploits this: an identical sequence must score 0).
    */
  def searchTrajectory(df: DataFrame, seqCol: Column, tsCol: Column,
                       vecCol: Column, query: Seq[Array[Float]],
                       method: TrajectoryDistance, limit: Int,
                       excludeSeq: Option[Any] = None): DataFrame = {
    require(query.nonEmpty, "trajectory search needs a non-empty query sequence")
    val base = excludeSeq.fold(df)(x => df.filter(seqCol =!= lit(x)))
    method match {
      case TrajectoryDistance.CentroidDistance =>
        // pure relational path: f32-truncated centroids, f64 distance
        val qc = {
          val dims = query.head.length
          val acc = new Array[Double](dims)
          query.foreach { v => var i = 0; while (i < dims) { acc(i) += v(i); i += 1 } }
          acc.map(s => (s / query.length).toFloat)
        }
        centroids(base, seqCol, vecCol)
          .withColumn("q", element_at(lit(qc), col("dim") + 1))
          .groupBy(col("seq"))
          .agg(sqrt(sum((col("value").cast("double") - col("q").cast("double")) *
            (col("value").cast("double") - col("q").cast("double")))).as("distance"))
          .orderBy(col("distance").asc, col("seq").asc)
          .limit(limit)
      case m =>
        val qa: Array[Array[Float]] = query.toArray
        val kernel = udf { (t: Seq[Seq[Float]]) =>
          val ta = toArr(t)
          m match {
            case TrajectoryDistance.Dtw => dtwArr(qa, ta)
            case _                      => frechetArr(qa, ta)
          }
        }
        trajectories(base, seqCol, tsCol, vecCol)
          .withColumn("distance", kernel(col("trajectory")))
          .select(col("seq"), col("distance"))
          .orderBy(col("distance").asc, col("seq").asc)
          .limit(limit)
    }
  }

  /** Both trajectory kernels in ONE pass over one per-sequence array —
    * for callers that need DTW and Fréchet together (e.g. the dtw-
    * dominates-frechet self-check) without building the trajectory frame
    * twice. Output: (seq, distance [dtw], frechet).
    */
  def searchTrajectoryBoth(df: DataFrame, seqCol: Column, tsCol: Column,
                           vecCol: Column, query: Seq[Array[Float]],
                           limit: Int): DataFrame = {
    require(query.nonEmpty, "trajectory search needs a non-empty query sequence")
    val qa: Array[Array[Float]] = query.toArray
    val kernel = udf { (t: Seq[Seq[Float]]) =>
      val ta = toArr(t)
      (dtwArr(qa, ta), frechetArr(qa, ta))
    }
    trajectories(df, seqCol, tsCol, vecCol)
      .withColumn("__k", kernel(col("trajectory")))
      .select(col("seq"), col("__k._1").as("distance"),
        col("__k._2").as("frechet"))
      .orderBy(col("distance").asc, col("seq").asc)
      .limit(limit)
  }
}
