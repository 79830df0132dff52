package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAgg
import graft.ops.Search

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = sf("embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 3)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vector"))

  test("aggregator keeps the k smallest (score, id) pairs, ascending") {
    val agg = new TopKAgg.TopKAggregator(3)
    var b = agg.zero
    Seq((5.0, 1L), (1.0, 2L), (3.0, 3L), (0.5, 4L), (3.0, 1L), (9.0, 9L))
      .foreach { case (s, i) => b = agg.reduce(b, (s, i)) }
    assert(agg.finish(b) == Seq((0.5, 4L), (1.0, 2L), (3.0, 1L)))
  }

  test("aggregator merge equals reduce over the concatenation") {
    val agg = new TopKAgg.TopKAggregator(4)
    val xs = (1 to 20).map(i => ((i * 7 % 13).toDouble, i.toLong))
    val (l, r) = xs.splitAt(9)
    var bl = agg.zero; l.foreach(x => bl = agg.reduce(bl, x))
    var br = agg.zero; r.foreach(x => br = agg.reduce(br, x))
    var all = agg.zero; xs.foreach(x => all = agg.reduce(all, x))
    assert(agg.finish(agg.merge(bl, br)) == agg.finish(all))
  }

  test("equal scores break ties by ascending id (window parity)") {
    val agg = new TopKAgg.TopKAggregator(2)
    var b = agg.zero
    Seq((1.0, 9L), (1.0, 3L), (1.0, 7L), (1.0, 1L))
      .foreach { case (s, i) => b = agg.reduce(b, (s, i)) }
    assert(agg.finish(b) == Seq((1.0, 1L), (1.0, 3L)))
  }

  test("batchTopKPairs matches the window formulation exactly") {
    val viaAgg = Search.batchTopKPairs(emb, queries, k = 4,
        vecCol = "embedding", idCol = "vec_id")
      .select(col("query_id").cast("long"), col("vec_id"),
        round(col("distance"), 9).as("d"))
      .as[(Long, Long, Double)].collect().toSet
    val viaWindow = Search.batchTopK(emb, queries, k = 4,
        vecCol = "embedding", idCol = "vec_id")
      .select(col("query_id").cast("long"), col("vec_id").cast("long"),
        round(col("distance"), 9).as("d"))
      .as[(Long, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }

  test("batchTopKRows carries payload columns for each winner") {
    val rows = Search.batchTopKRows(emb, queries, k = 2,
      vecCol = "embedding", idCol = "vec_id")
    assert(rows.columns.contains("label") && rows.columns.contains("embedding"))
    val counts = rows.groupBy("query_id").count().select("count").as[Long].collect()
    assert(counts.length == 3 && counts.forall(_ == 2))
  }

  test("plan: pairs variant aggregates (partial-merge), no Window over scored rows") {
    val plan = Search.batchTopKPairs(emb, queries, k = 4,
      vecCol = "embedding", idCol = "vec_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(!plan.contains("Window"))
  }
}
