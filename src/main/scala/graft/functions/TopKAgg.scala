package graft.functions

import org.apache.spark.sql.{Column, Encoder, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation (SURVEY.md §2.3 batch search at scale).
  *
  * The window formulation of a grouped top-k (`row_number() OVER
  * (PARTITION BY group ORDER BY score)` then `rank <= k`) shuffles and
  * sorts EVERY scored row before the rank filter runs — for batch search
  * that is |queries| × |vectors| rows through the exchange, the dominant
  * cost at 100 TB. This typed [[Aggregator]] instead keeps a bounded
  * k-element buffer per group on the map side (partial aggregation /
  * ObjectHashAggregate), so the shuffle carries only
  * |partitions| × |groups| × k pre-reduced buffers — the distributed
  * analogue of the reference's per-segment bounded heap merge
  * (reference: src/collection/batch.rs:32-76, search_methods.rs:189-271).
  *
  * Ordering is ascending (score, id): the smallest k scores win, ties
  * broken by ascending id — identical tie semantics to the window + oracle
  * formulation, so results are deterministic across partitionings.
  *
  * The buffer is a simple sorted-insert array rather than a binary heap:
  * k is small (10s), and the common case — a row worse than the current
  * k-th — is rejected with one comparison against the last element.
  */
object TopKAgg {

  /** Bounded buffer: parallel arrays sorted ascending by (score, id). */
  final case class Buf(var scores: Array[Double], var ids: Array[Long])

  class TopKAggregator(k: Int) extends Aggregator[(Double, Long), Buf, Seq[(Double, Long)]] {
    def zero: Buf = Buf(Array.emptyDoubleArray, Array.emptyLongArray)

    private def insert(b: Buf, s: Double, id: Long): Buf = {
      val n = b.scores.length
      if (n >= k) {
        val worstS = b.scores(n - 1)
        if (s > worstS || (s == worstS && id >= b.ids(n - 1))) return b
      }
      // binary search for the insertion point in (score, id) order
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val ms = b.scores(mid)
        if (ms < s || (ms == s && b.ids(mid) < id)) lo = mid + 1 else hi = mid
      }
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m); val ni = new Array[Long](m)
      System.arraycopy(b.scores, 0, ns, 0, lo)
      System.arraycopy(b.ids, 0, ni, 0, lo)
      ns(lo) = s; ni(lo) = id
      val tail = m - lo - 1
      if (tail > 0) {
        System.arraycopy(b.scores, lo, ns, lo + 1, tail)
        System.arraycopy(b.ids, lo, ni, lo + 1, tail)
      }
      b.scores = ns; b.ids = ni
      b
    }

    def reduce(b: Buf, a: (Double, Long)): Buf = insert(b, a._1, a._2)

    def merge(x: Buf, y: Buf): Buf = {
      var r = x; var i = 0
      while (i < y.scores.length) { r = insert(r, y.scores(i), y.ids(i)); i += 1 }
      r
    }

    def finish(b: Buf): Seq[(Double, Long)] =
      b.scores.indices.map(i => (b.scores(i), b.ids(i)))

    def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** `topK(k)(scoreCol, idCol)` → array<struct<_1: score, _2: id>> of the k
    * smallest (score, id) pairs, ascending. Explode + select `_1`/`_2` to
    * get back to rows.
    */
  def topKF(k: Int)(score: Column, id: Column): Column =
    F.udaf(new TopKAggregator(k), ExpressionEncoder[(Double, Long)]())(score, id)
}
