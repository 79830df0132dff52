package graft

import org.apache.spark.sql.functions._

import graft.ops.GraphRag

class GraphRagSpec extends SparkSpec {
  import spark.implicits._

  test("entity extraction: capitalized non-initial words, trimmed, deduped (graphrag.rs:188)") {
    val docs = Seq(
      (1L, "The Apache Spark engine. Spark talks to Kafka, and (Kafka) to Flink."),
      (2L, "nothing capitalized here. lowercase only")).toDF("doc_id", "text")
    val got = GraphRag.extractEntities(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val d1 = got.filter(_._1 == 1L).map(_._3).toSet
    // "The" skipped (sentence-initial), Apache/Spark/Kafka/Flink kept once
    assert(d1 == Set("Apache", "Spark", "Kafka", "Flink"))
    assert(got.filter(_._1 == 2L).isEmpty)
    assert(got.forall { case (_, id, name) => id == s"entity_${name.toLowerCase}" })
  }

  test("co-occurrence edges weight = number of shared documents") {
    val ents = Seq(
      (1L, "entity_spark", "Spark"), (1L, "entity_kafka", "Kafka"),
      (2L, "entity_spark", "Spark"), (2L, "entity_kafka", "Kafka"),
      (2L, "entity_flink", "Flink")).toDF("doc_id", "entity_id", "name")
    val e = GraphRag.cooccurrenceEdges(ents).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(e(("entity_kafka", "entity_spark")) == 2.0)
    assert(e(("entity_flink", "entity_kafka")) == 1.0)
    assert(e.size == 3)
  }

  test("hybrid search: seeds score by vector, expansion decays 1/(1+hop), max-merge") {
    val vectors = Seq(
      ("a", Array(1f, 0f)),    // exact match seed
      ("b", Array(0.9f, 0.3f)),
      ("c", Array(0f, 1f)),    // far — reachable only through the graph
      ("d", Array(-1f, 0f))).toDF("id", "vector")
    val edges = Seq(("a", "c"), ("c", "d")).toDF("src", "dst")
    val got = GraphRag.search(vectors, edges, Array(1f, 0f), k = 2,
      maxHops = 2, vectorWeight = 0.7, graphWeight = 0.3)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getInt(3), r.getDouble(4))).toMap
    // seeds: a (d=0 → vs=1), b (vs = 1 - d_b/d_b = 0 as max dist) — hop 0
    val (vsA, gsA, hopA, combA) = got("a")
    assert(vsA == 1.0 && gsA == 1.0 && hopA == 0)
    assert(math.abs(combA - (0.7 * 1.0 + 0.3)) < 1e-9)
    // c reached at hop 1 from a: combined = 0.7·1 + 0.3·(1/2)
    if (got.contains("c")) {
      val (_, gsC, hopC, combC) = got("c")
      assert(hopC == 1 && math.abs(gsC - 0.5) < 1e-9)
      assert(math.abs(combC - (0.7 + 0.15)) < 1e-9)
    }
    // k=2 rows total, ordered by combined
    assert(got.size == 2)
  }

  test("importance: high-degree hub ranks first; mass conserved-ish") {
    // star graph: hub connected to 3 leaves
    val edges = Seq(("hub", "l1"), ("hub", "l2"), ("hub", "l3"))
      .toDF("src", "dst").withColumn("weight", lit(1.0))
    val imp = GraphRag.importance(edges, iterations = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(imp.head._1 == "hub")
    val total = imp.map(_._2).sum
    assert(total > 0.9 && total < 1.1, s"total importance $total")
  }
}
