package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Vector aggregates (SURVEY.md §2.6; reference:
  * src/experimental/vector_aggregation.rs).
  *
  * Element-wise accumulation is done in Double — exactly what the reference
  * does internally (vector_aggregation.rs:28-75 computes in f64) — and is
  * order-insensitive enough for distributed merge; outputs are cast back to
  * Float (the engine's vector element type).
  *
  * Implemented as a typed [[Aggregator]] exposed through `functions.udaf`,
  * which gives a partial-aggregate (map-side combine) plan: each partition
  * reduces to one (sums, count) pair, so the shuffle is O(partitions ×
  * dimensions) regardless of row count — the right shape at 100 TB.
  */
object VectorAgg {

  /** Element-wise sum + count buffer. */
  final case class CentroidBuf(var sums: Array[Double], var n: Long)

  class CentroidAggregator extends Aggregator[Array[Float], CentroidBuf, Array[Float]] {
    def zero: CentroidBuf = CentroidBuf(Array.emptyDoubleArray, 0L)
    def reduce(b: CentroidBuf, a: Array[Float]): CentroidBuf = {
      if (a == null) return b
      if (b.sums.length == 0) b.sums = new Array[Double](a.length)
      var i = 0
      while (i < a.length) { b.sums(i) += a(i); i += 1 }
      b.n += 1
      b
    }
    def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
      if (x.sums.length == 0) return y
      if (y.sums.length == 0) return x
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }
    def finish(b: CentroidBuf): Array[Float] =
      if (b.n == 0) null else b.sums.map(s => (s / b.n).toFloat)
    def bufferEncoder: Encoder[CentroidBuf] = ExpressionEncoder[CentroidBuf]()
    def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
  }

  /** Element-wise sum (no divide) — building block for weighted schemes. */
  class VectorSumAggregator extends CentroidAggregator {
    override def finish(b: CentroidBuf): Array[Float] =
      if (b.n == 0) null else b.sums.map(_.toFloat)
  }

  private lazy val centroidUdaf =
    F.udaf(new CentroidAggregator, ExpressionEncoder[Array[Float]]())
  private lazy val vectorSumUdaf =
    F.udaf(new VectorSumAggregator, ExpressionEncoder[Array[Float]]())

  /** Centroid = element-wise mean (reference: vector_aggregation.rs:91-116). */
  def centroidF(c: Column): Column = centroidUdaf(c)
  def centroidF(name: String): Column = centroidUdaf(F.col(name))

  def vectorSumF(c: Column): Column = vectorSumUdaf(c)
}
