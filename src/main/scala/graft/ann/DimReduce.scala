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
}
