package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimensionality reduction for embedding columns (reference:
  * src/ml/dimreduce.rs — PCA via power iteration :47-240, random
  * projection :250+). The pipeline use-cases: compress embeddings before
  * ANN indexing, 2-D projection for inspection, cheap JL sketches.
  *
  * Scale shape mirrors the IVF recipe: the FIT runs driver-locally over a
  * bounded unbiased sample ([[Ivf.boundedSample]] — power iteration over
  * ≤maxTrainRows vectors costs milliseconds and zero cluster round-trips
  * per iteration, where a distributed eigensolver is jobs-per-iteration),
  * and the TRANSFORM is a narrow per-row map over the full table.
  */
object DimReduce {

  /** Fitted PCA model (components are orthonormal, row-major). */
  final case class Pca(components: Array[Array[Float]], mean: Array[Float],
                       explainedVariance: Array[Float], totalVariance: Float) {
    def inputDims: Int = mean.length
    def nComponents: Int = components.length

    def explainedVarianceRatio: Array[Float] =
      if (totalVariance > 0) explainedVariance.map(_ / totalVariance)
      else explainedVariance.map(_ => 0f)

    /** Project one vector: (v − mean) · componentᵢ. */
    def transformOne(v: Array[Float]): Array[Float] = {
      val out = new Array[Float](nComponents)
      var c = 0
      while (c < nComponents) {
        var s = 0.0; var i = 0
        while (i < inputDims) {
          s += (v(i) - mean(i)) * components(c)(i); i += 1
        }
        out(c) = s.toFloat; c += 1
      }
      out
    }

    /** Back-projection: mean + Σ yᵢ·componentᵢ (dimreduce.rs:204). */
    def inverseTransformOne(y: Array[Float]): Array[Float] = {
      val out = mean.clone()
      var c = 0
      while (c < nComponents) {
        var i = 0
        while (i < inputDims) { out(i) += y(c) * components(c)(i); i += 1 }
        c += 1
      }
      out
    }

    /** Distributed transform column (one compiled pass per row). */
    def transform(vecCol: Column): Column = {
      val m = this
      udf((v: Seq[Float]) =>
        if (v == null) null else m.transformOne(v.toArray)).apply(vecCol)
    }
  }

  /** Fit on a bounded unbiased sample; components found by power
    * iteration with Gram-Schmidt deflation, X^T(Xv) computed two-pass so
    * the d×d covariance never materializes (dimreduce.rs:42-120).
    */
  def fitPca(df: DataFrame, vecCol: Column, nComponents: Int,
             maxTrainRows: Int = 100000, seed: Long = 42L,
             maxIter: Int = 100, tol: Double = 1e-6): Pca = {
    val x: Array[Array[Float]] = Ivf.boundedSample(
      df.select(vecCol.cast("array<float>").as("v")), maxTrainRows, seed)
      .collect().map(_.getSeq[Float](0).toArray)
    require(x.nonEmpty, "Cannot fit PCA on an empty dataset")
    val n = x.length
    val d = x(0).length
    val k = math.min(nComponents, math.min(n, d))
    // mean-center
    val mean = new Array[Float](d)
    x.foreach { v => var i = 0; while (i < d) { mean(i) += v(i); i += 1 } }
    var i = 0; while (i < d) { mean(i) /= n; i += 1 }
    val cx = x.map { v =>
      val o = new Array[Double](d)
      var j = 0; while (j < d) { o(j) = v(j) - mean(j); j += 1 }
      o
    }
    // total variance = mean squared norm of centered rows / n per dim sum
    var tv = 0.0
    cx.foreach { v => var j = 0; while (j < d) { tv += v(j) * v(j); j += 1 } }
    tv /= n
    val rnd = new scala.util.Random(seed)
    val comps = Array.ofDim[Double](k, d)
    val eigs = new Array[Double](k)
    var c = 0
    while (c < k) {
      var v = Array.fill(d)(rnd.nextGaussian())
      var prev = 0.0
      var it = 0
      var done = false
      while (it < maxIter && !done) {
        // w = X^T (X v), two-pass
        val w = new Array[Double](d)
        cx.foreach { row =>
          var dot = 0.0; var j = 0
          while (j < d) { dot += row(j) * v(j); j += 1 }
          j = 0; while (j < d) { w(j) += dot * row(j); j += 1 }
        }
        // deflate: orthogonalize against found components
        var p = 0
        while (p < c) {
          var dot = 0.0; var j = 0
          while (j < d) { dot += w(j) * comps(p)(j); j += 1 }
          j = 0; while (j < d) { w(j) -= dot * comps(p)(j); j += 1 }
          p += 1
        }
        var norm = 0.0
        var j = 0; while (j < d) { norm += w(j) * w(j); j += 1 }
        norm = math.sqrt(norm)
        if (norm < 1e-12) { done = true }
        else {
          j = 0; while (j < d) { w(j) /= norm; j += 1 }
          v = w
          if (math.abs(norm - prev) < tol) done = true
          prev = norm
        }
        it += 1
      }
      comps(c) = v
      eigs(c) = prev / n
      c += 1
    }
    Pca(comps.map(_.map(_.toFloat)), mean,
      eigs.map(_.toFloat), tv.toFloat)
  }

  /** Seeded Gaussian random projection (dimreduce.rs RandomProjection) —
    * the Johnson-Lindenstrauss sketch: distances preserved within
    * O(√(log n / k)) with no training at all. Scaled by 1/√k so expected
    * squared norms are preserved.
    */
  final case class RandomProjection(inputDims: Int, outputDims: Int,
                                    seed: Long = 42L) {
    private lazy val matrix: Array[Array[Float]] = {
      val rnd = new scala.util.Random(seed)
      val scale = (1.0 / math.sqrt(outputDims)).toFloat
      Array.fill(outputDims)(Array.fill(inputDims)(
        (rnd.nextGaussian() * scale).toFloat))
    }

    def projectOne(v: Array[Float]): Array[Float] = {
      val out = new Array[Float](outputDims)
      var c = 0
      while (c < outputDims) {
        var s = 0.0; var i = 0
        while (i < inputDims) { s += v(i) * matrix(c)(i); i += 1 }
        out(c) = s.toFloat; c += 1
      }
      out
    }

    def project(vecCol: Column): Column = {
      val rp = this
      udf((v: Seq[Float]) =>
        if (v == null) null else rp.projectOne(v.toArray)).apply(vecCol)
    }
  }

  /** Sparse (Achlioptas) random projection — the reference's DEFAULT
    * RandomProjection (dimreduce.rs:264-303): entries ±√(3/k) with
    * probability 1/6 each and 0 with probability 2/3, so 2/3 of the
    * multiply-adds vanish. Seeded here (the reference draws from StdRng
    * or thread_rng; determinism is this engine's convention).
    */
  final case class SparseProjection(inputDims: Int, outputDims: Int,
                                    seed: Long = 42L) {
    private lazy val matrix: Array[Array[Float]] = {
      val rnd = new scala.util.Random(seed)
      val scale = math.sqrt(3.0 / outputDims).toFloat
      Array.fill(outputDims)(Array.fill(inputDims) {
        val r = rnd.nextFloat()
        if (r < 1f / 6f) scale else if (r < 5f / 6f) 0f else -scale
      })
    }

    def projectOne(v: Array[Float]): Array[Float] = {
      val out = new Array[Float](outputDims)
      var c = 0
      while (c < outputDims) {
        var s = 0.0; var i = 0
        while (i < inputDims) { s += v(i) * matrix(c)(i); i += 1 }
        out(c) = s.toFloat; c += 1
      }
      out
    }

    def project(vecCol: Column): Column = {
      val rp = this
      udf((v: Seq[Float]) =>
        if (v == null) null else rp.projectOne(v.toArray)).apply(vecCol)
    }
  }

  /** Smallest component count whose cumulative explained-variance ratio
    * reaches `targetVariance` (dimreduce.rs:606-623): fit at
    * min(dims, sampleRows, 50) components, walk the cumulative ratio,
    * fall back to the max when the target is never reached. The fit uses
    * the same bounded-sample recipe as [[fitPca]].
    */
  def findOptimalComponents(df: DataFrame, vecCol: Column,
                            targetVariance: Float,
                            maxTrainRows: Int = 100000,
                            seed: Long = 42L): Int = {
    val probe = Ivf.boundedSample(
      df.select(vecCol.cast("array<float>").as("v")), maxTrainRows, seed)
    val sample = probe.collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "Empty dataset")
    val maxComponents = math.min(math.min(sample(0).length, sample.length), 50)
    val pca = fitPca(df, vecCol, maxComponents, maxTrainRows, seed)
    val cumulative = pca.explainedVarianceRatio
      .scanLeft(0f)(_ + _).drop(1)
    cumulative.indexWhere(_ >= targetVariance) match {
      case -1 => maxComponents
      case i  => i + 1
    }
  }

  /** Simplified t-SNE-style neighbor embedding for 2-D/3-D visualization
    * (dimreduce.rs:356-600): perplexity-calibrated Gaussian affinities
    * (50-step binary search per point), Student-t low-dimensional
    * affinities, KL gradient descent with momentum 0.8, mean-centered
    * output. O(n²) per iteration BY CONSTRUCTION (all-pairs affinities),
    * exactly like the reference — a driver-local visualization utility,
    * NOT a corpus operator, so [[fitTransformDf]] enforces a hard row
    * bound instead of pretending to distribute it (the same adjudication
    * as CodeSearch's stress-majorization layout). Init is seeded (the
    * reference uses thread_rng; determinism is this engine's convention).
    */
  final case class NeighborEmbedding(outputDims: Int = 2,
                                     perplexity: Float = 30f,
                                     learningRate: Float = 200f,
                                     nIter: Int = 1000,
                                     seed: Long = 42L) {

    def fitTransform(vectors: Array[Array[Float]]): Array[Array[Float]] = {
      val n = vectors.length
      if (n == 0) return Array.empty
      val p = affinities(pairwiseSqDist(vectors))
      val rnd = new scala.util.Random(seed)
      val y = Array.fill(n)(Array.fill(outputDims)(
        (rnd.nextFloat() - 0.5f) * 0.01f))
      val velocity = Array.fill(n)(new Array[Float](outputDims))
      val momentum = 0.8f
      var it = 0
      while (it < nIter) {
        val q = lowDimAffinities(y)
        val g = gradients(p, q, y)
        var i = 0
        while (i < n) {
          var j = 0
          while (j < outputDims) {
            velocity(i)(j) = momentum * velocity(i)(j) -
              learningRate * g(i)(j)
            y(i)(j) += velocity(i)(j)
            j += 1
          }
          i += 1
        }
        it += 1
      }
      // center (dimreduce.rs:445-460)
      val mean = new Array[Float](outputDims)
      y.foreach(yi => (0 until outputDims).foreach(j => mean(j) += yi(j)))
      (0 until outputDims).foreach(j => mean(j) /= n)
      y.foreach(yi => (0 until outputDims).foreach(j => yi(j) -= mean(j)))
      y
    }

    /** Bounded DataFrame front-end: (id, y array&lt;float&gt;). */
    def fitTransformDf(df: DataFrame, idCol: Column, vecCol: Column,
                       maxDriverRows: Int = 2000): DataFrame = {
      val rows = df.select(idCol.as("id"),
        vecCol.cast("array<float>").as("v")).limit(maxDriverRows + 1)
        .collect()
      require(rows.length <= maxDriverRows,
        s"NeighborEmbedding is an O(n²)-per-iteration driver-local " +
          s"visualization utility: input exceeds $maxDriverRows rows — " +
          "sample first (Ivf.boundedSample) or raise the bound knowingly")
      val ids = rows.map(_.get(0))
      val y = fitTransform(rows.map(_.getSeq[Float](1).toArray))
      val spark = df.sparkSession
      import spark.implicits._
      spark.createDataFrame(
        spark.sparkContext.parallelize(ids.zip(y).toSeq.map {
          case (id, yi) => (id.toString, yi.toSeq)
        }, 1)).toDF("id", "y")
    }

    private def pairwiseSqDist(
        v: Array[Array[Float]]): Array[Array[Float]] = {
      val n = v.length
      val d = Array.fill(n)(new Array[Float](n))
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          var s = 0f; var t = 0
          while (t < v(i).length) {
            val diff = v(i)(t) - v(j)(t); s += diff * diff; t += 1
          }
          d(i)(j) = s; d(j)(i) = s; j += 1
        }
        i += 1
      }
      d
    }

    /** dimreduce.rs:483-542: per-point sigma by 50-step binary search to
      * the target entropy ln(perplexity), then symmetrize with the 1e-12
      * floor.
      */
    private def affinities(
        dist: Array[Array[Float]]): Array[Array[Float]] = {
      val n = dist.length
      val target = math.log(perplexity.toDouble).toFloat
      val p = Array.fill(n)(new Array[Float](n))
      var i = 0
      while (i < n) {
        var sigma = 1f; var sigmaMin = 1e-10f; var sigmaMax = 1e10f
        var step = 0
        var done = false
        while (step < 50 && !done) {
          var sum = 0f
          var j = 0
          while (j < n) {
            if (i != j) {
              p(i)(j) = math.exp(
                (-dist(i)(j) / (2f * sigma * sigma)).toDouble).toFloat
              sum += p(i)(j)
            }
            j += 1
          }
          if (sum > 0f) { j = 0; while (j < n) { p(i)(j) /= sum; j += 1 } }
          var entropy = 0f
          j = 0
          while (j < n) {
            val x = p(i)(j)
            if (x > 1e-10f) entropy -= x * math.log(x.toDouble).toFloat
            j += 1
          }
          if (math.abs(entropy - target) < 1e-5f) done = true
          else if (entropy > target) {
            sigmaMax = sigma; sigma = (sigma + sigmaMin) / 2f
          } else { sigmaMin = sigma; sigma = (sigma + sigmaMax) / 2f }
          step += 1
        }
        i += 1
      }
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val pij = math.max((p(i)(j) + p(j)(i)) / (2f * n), 1e-12f)
          p(i)(j) = pij; p(j)(i) = pij; j += 1
        }
        i += 1
      }
      p
    }

    /** dimreduce.rs:545-573: Student-t kernel, globally normalized. */
    private def lowDimAffinities(
        y: Array[Array[Float]]): Array[Array[Float]] = {
      val n = y.length
      val q = Array.fill(n)(new Array[Float](n))
      var sum = 0f
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          var s = 0f; var t = 0
          while (t < outputDims) {
            val diff = y(i)(t) - y(j)(t); s += diff * diff; t += 1
          }
          val qij = 1f / (1f + s)
          q(i)(j) = qij; q(j)(i) = qij; sum += 2f * qij
          j += 1
        }
        i += 1
      }
      if (sum > 0f) {
        i = 0
        while (i < n) {
          var j = 0
          while (j < n) {
            q(i)(j) = math.max(q(i)(j) / sum, 1e-12f); j += 1
          }
          i += 1
        }
      }
      q
    }

    /** dimreduce.rs:576-600: 4(p−q)/(1+d²) pull-push. */
    private def gradients(p: Array[Array[Float]], q: Array[Array[Float]],
                          y: Array[Array[Float]]): Array[Array[Float]] = {
      val n = y.length
      val g = Array.fill(n)(new Array[Float](outputDims))
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          if (i != j) {
            var s = 0f; var t = 0
            while (t < outputDims) {
              val diff = y(i)(t) - y(j)(t); s += diff * diff; t += 1
            }
            val mult = 4f * (p(i)(j) - q(i)(j)) / (1f + s)
            t = 0
            while (t < outputDims) {
              g(i)(t) += mult * (y(i)(t) - y(j)(t)); t += 1
            }
          }
          j += 1
        }
        i += 1
      }
      g
    }
  }
}
