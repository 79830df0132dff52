package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight-loop distance kernels over Spark `ArrayData` (ARRAY&lt;FLOAT&gt;).
  *
  * Semantics mirror the reference engine's scalar core
  * (reference: src/distance.rs:42-420):
  *   - cosine            `1 - a.b/(|a||b|)`, zero norm -> 1.0  (src/distance.rs:153-164)
  *   - cosineNormalized  `1 - a.b` for pre-normalized inputs    (src/distance.rs:193-196)
  *   - euclidean         `sqrt(sum((a-b)^2))`                   (src/distance.rs:203-212)
  *   - dot               `-(a.b)` (negated so smaller = closer) (src/distance.rs:259-264)
  *   - manhattan         `sum(|a-b|)`                           (src/distance.rs:318-323)
  *   - hamming           count of positions where (a!=0)!=(b!=0) (src/distance.rs:380-394)
  *   - chebyshev         `max(|a-b|)`                           (src/distance.rs:68-72)
  *
  * Inputs are float32 (the reference's only vector element type,
  * src/collection/insert.rs:36); accumulation is in double — the reference's
  * own vector-aggregation module does the same (src/experimental/
  * vector_aggregation.rs:28-75) and it keeps the DuckDB oracle comparable.
  * Methods are called from whole-stage-generated Java via the static
  * forwarders on this object, so each row costs one static call + one loop.
  */
object DistanceKernels {

  @inline private def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"Dimension mismatch: ${n} vs ${b.numElements()}")
    n
  }

  def dotRaw(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var i = 0; var s = 0.0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var i = 0; var dot = 0.0; var na = 0.0; var nb = 0.0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0
    else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineNormalized(a: ArrayData, b: ArrayData): Double =
    1.0 - dotRaw(a, b)

  def sqEuclidean(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var i = 0; var s = 0.0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    s
  }

  def euclidean(a: ArrayData, b: ArrayData): Double =
    math.sqrt(sqEuclidean(a, b))

  def dot(a: ArrayData, b: ArrayData): Double = -dotRaw(a, b)

  def manhattan(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var i = 0; var s = 0.0
    while (i < n) {
      s += math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble); i += 1
    }
    s
  }

  def hamming(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var i = 0; var c = 0
    while (i < n) {
      if ((a.getFloat(i) != 0.0f) != (b.getFloat(i) != 0.0f)) c += 1
      i += 1
    }
    c.toDouble
  }

  def chebyshev(a: ArrayData, b: ArrayData): Double = {
    val n = checkDims(a, b)
    var i = 0; var m = 0.0
    while (i < n) {
      val d = math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble)
      if (d > m) m = d
      i += 1
    }
    m
  }
}
