package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Vector-space anomaly detection (reference: src/observe/anomaly.rs) —
  * Local Outlier Factor and Isolation Forest.
  *
  * LOF is pure relational algebra over a k-NN edge list (anomaly.rs:
  * 54-131): k-distance = max neighbor distance, reachability r(p,o) =
  * max(d(p,o), k-distance(o)), lrd(p) = |N(p)| / Σ r, LOF(p) =
  * Σ lrd(o) / (|N(p)|·lrd(p)). Every step is an equi-join on id + a
  * grouped aggregate, so the SAME algebra runs over an exact all-pairs
  * edge list (the small-n oracle) or [[SemanticGraph.buildBlocked]]'s
  * IVF-candidate edges (the 100 TB path) — pass `edges` to choose.
  * Degenerate densities follow the reference: a zero reach-sum makes lrd
  * infinite (represented as null), scoring 1.0 itself and contributing 0
  * to its neighbors.
  *
  * Isolation Forest (anomaly.rs:240-345) follows the repo's IVF recipe:
  * trees are FIT DRIVER-SIDE on bounded random samples (the reference
  * itself subsamples to `sample_size` per tree) and SCORED distributedly —
  * the forest ships in a UDF closure, scoring is one narrow pass with no
  * shuffle. Randomness is seeded, unlike the reference's thread_rng.
  */
object Anomaly {

  /** Exact k-NN edges (src, dst, distance): the O(n²) definitional form,
    * guarded the same way as the medoid — beyond `maxExactRows` callers
    * must supply blocked edges.
    */
  def exactKnnEdges(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
                    metric: String = "euclidean",
                    maxExactRows: Int = 10000): DataFrame = {
    require(df.limit(maxExactRows + 1).count() <= maxExactRows,
      s"exact all-pairs k-NN beyond $maxExactRows rows — pass blocked edges " +
        "(SemanticGraph.buildBlocked) instead")
    val a = df.select(idCol.as("src"), vecCol.as("__va"))
    val b = df.select(idCol.as("dst"), vecCol.as("__vb"))
    val w = Window.partitionBy(col("src")).orderBy(col("distance").asc, col("dst").asc)
    a.join(b, col("src") =!= col("dst"))
      .withColumn("distance", Distances.distance(metric, col("__va"), col("__vb")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("src"), col("dst"), col("distance"))
  }

  /** IVF-blocked k-NN edges with RAW distances — the scale form of
    * [[exactKnnEdges]] (same candidate recipe as
    * `SemanticGraph.buildBlocked`, kept separate because that surface
    * emits clamped similarities while LOF's reachability algebra needs
    * the metric distance itself). Candidate pairs come from shared
    * probed IVF cells (bounded rows×nprobe join input, never all-pairs);
    * at `nprobe = numCells` the candidate set is complete, so
    * full-probe blocked edges are row-identical to the exact ones
    * (spec-asserted) — the recall/cost dial is `nprobe`.
    */
  def blockedKnnEdges(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
                      metric: String = "euclidean", numCells: Int = 16,
                      nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    import graft.ann.Ivf
    val base = df.select(idCol.as("id"), vecCol.as("__v"))
    val ix = Ivf.build(base, col("__v"), numCells, metric, seed)
    val assigned = base.withColumn("cell",
      explode(Ivf.probeCellsOf(col("__v"), ix.centroids, metric, nprobe)))
    val a = assigned.select(col("cell"), col("id").as("src"),
      col("__v").as("__va"))
    val b = assigned.select(col("cell"), col("id").as("dst"),
      col("__v").as("__vb"))
    val pairs = a.join(b, Seq("cell")).filter(col("src") =!= col("dst"))
      .withColumn("__d", Distances.distance(metric, col("__va"), col("__vb")))
      .groupBy(col("src"), col("dst")).agg(min(col("__d")).as("distance"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("distance").asc, col("dst").asc)
    pairs.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("src"), col("dst"), col("distance"))
  }

  /** LOF beyond `maxExactRows`: the same algebra over blocked edges. */
  def lofBlocked(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
                 metric: String = "euclidean", numCells: Int = 16,
                 nprobe: Int = 4, seed: Long = 42L): DataFrame =
    lofFromEdges(blockedKnnEdges(df, idCol, vecCol, k, metric, numCells,
      nprobe, seed))

  /** LOF scores (id, lof_score) from a k-NN edge list (anomaly.rs:87-131). */
  def lofFromEdges(edges: DataFrame): DataFrame = {
    val kd = edges.groupBy(col("src").as("id")).agg(max(col("distance")).as("kdist"))
    val reach = edges
      .join(kd.withColumnRenamed("id", "dst"), "dst")
      .withColumn("r", greatest(col("distance"), col("kdist")))
    val lrd = reach.groupBy(col("src").as("id"))
      .agg(when(sum(col("r")) > 0,
        count(lit(1)).cast("double") / sum(col("r"))).as("lrd"))
    val lrdDst = lrd.select(col("id").as("dst"), col("lrd").as("__lrd_dst"))
    val lrdSrc = lrd.select(col("id").as("src"), col("lrd").as("__lrd_src"))
    edges.join(lrdDst, "dst").join(lrdSrc, "src")
      .groupBy(col("src").as("id"))
      .agg(
        // null lrd = infinite density: the point itself scores 1.0 and
        // contributes 0 to neighbors (anomaly.rs:105-121)
        when(max(col("__lrd_src")).isNull, lit(1.0))
          .otherwise(sum(coalesce(col("__lrd_dst"), lit(0.0))) /
            (count(lit(1)) * max(col("__lrd_src"))))
          .as("lof_score"))
  }

  /** Fit-and-score LOF over a collection (exact edges — the oracle form). */
  def lof(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
          metric: String = "euclidean"): DataFrame =
    lofFromEdges(exactKnnEdges(df, idCol, vecCol, k, metric))

  // ------------------------------------------------------ isolation forest

  private final case class Node(dim: Int, split: Float, left: Option[Node],
                                right: Option[Node], size: Int)
      extends Serializable

  /** Driver-fit forest; scoring is a serializable function of one vector. */
  final class Forest private[Anomaly] (trees: Seq[Node], sampleSize: Int)
      extends Serializable {
    private val c = Forest.avgPathLength(sampleSize)

    private def pathLength(n: Node, v: Seq[Float], depth: Int): Double =
      if (n.left.isEmpty && n.right.isEmpty)
        depth + Forest.avgPathLength(n.size) // unresolved leaf mass
      else if (v(n.dim) < n.split) n.left.fold(depth + 1.0)(pathLength(_, v, depth + 1))
      else n.right.fold(depth + 1.0)(pathLength(_, v, depth + 1))

    /** Anomaly score 2^(−avgPath/c(n)) — higher = more anomalous. */
    def score(v: Seq[Float]): Double =
      if (trees.isEmpty) 0.5
      else math.pow(2.0, -(trees.map(pathLength(_, v, 0)).sum / trees.length) / c)

    def scoreCol(vecCol: Column): Column = {
      val self = this
      udf((v: Seq[Float]) => self.score(v)).apply(vecCol)
    }
  }

  object Forest {
    private[Anomaly] def avgPathLength(n: Int): Double =
      if (n <= 1) 1.0
      else 2.0 * (math.log(n) + 0.5772157) - 2.0 * (n - 1.0) / n

    private def build(rows: Array[Array[Float]], dims: Int, depth: Int,
                      maxDepth: Int, rnd: scala.util.Random): Option[Node] = {
      if (rows.isEmpty) return None
      if (rows.length <= 1 || depth >= maxDepth)
        return Some(Node(-1, 0f, None, None, rows.length))
      val dim = rnd.nextInt(dims)
      val (lo, hi) = (rows.map(_(dim)).min, rows.map(_(dim)).max)
      if (lo == hi) return Some(Node(-1, 0f, None, None, rows.length))
      val split = lo + rnd.nextFloat() * (hi - lo)
      val (l, r) = rows.partition(_(dim) < split)
      Some(Node(dim, split, build(l, dims, depth + 1, maxDepth, rnd),
        build(r, dims, depth + 1, maxDepth, rnd), rows.length))
    }

    /** Fit on a bounded driver-side sample — the reference subsamples each
      * tree to `sampleSize` anyway (anomaly.rs:241-269), so the collect is
      * bounded at nTrees·sampleSize regardless of collection size.
      */
    def fit(df: DataFrame, vecCol: Column, nTrees: Int, sampleSize: Int,
            seed: Long = 42L): Forest = {
      val pool = df.select(vecCol).orderBy(rand(seed))
        .limit(nTrees * sampleSize)
        .collect().map(_.getSeq[Float](0).toArray)
      if (pool.isEmpty || pool.head.isEmpty) return new Forest(Nil, sampleSize)
      val dims = pool.head.length
      val rnd = new scala.util.Random(seed)
      val n = math.min(sampleSize, pool.length)
      val maxDepth = math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt
      val trees = (0 until nTrees).flatMap { _ =>
        val sample = rnd.shuffle(pool.indices.toVector).take(n)
          .map(pool).toArray
        build(sample, dims, 0, maxDepth, rnd)
      }
      new Forest(trees, n)
    }
  }
}
