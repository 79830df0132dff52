package graft

import org.apache.spark.sql.functions._

import graft.ops.VectorNamespace
import graft.ops.VectorNamespace.FieldQuery

/** Mirrors vector_namespace.rs's behavior: per-field brute-force search
  * with NULL fields skipped, weighted RRF fusion with k×3 over-fetch,
  * per-field metrics, and deterministic ordering.
  */
class VectorNamespaceSpec extends SparkSpec {
  import spark.implicits._

  // docs with two vector fields; doc "c" lacks the second field
  private def ns = Seq(
    ("a", Seq(1f, 0f), Seq(0f, 1f)),
    ("b", Seq(0.9f, 0.1f), Seq(1f, 0f)),
    ("c", Seq(0f, 1f), null.asInstanceOf[Seq[Float]]))
    .toDF("id", "text_vec", "image_vec")

  test("searchField ranks by the field's metric; NULL fields are skipped " +
      "(vector_namespace.rs:229-268)") {
    val r = VectorNamespace.searchField(ns, col("id"),
      FieldQuery("image", col("image_vec"), "cosine", Array(1f, 0f)),
      k = 5).collect()
    // c has no image_vec → only a and b rank; b is nearest
    assert(r.map(_.getString(0)).toSeq == Seq("b", "a"))
    assert(r.forall(_.getString(2) == "image"))
  }

  test("fusionSearch: weight/(rank0+60), summed across fields " +
      "(vector_namespace.rs:271-302)") {
    val r = VectorNamespace.fusionSearch(ns, col("id"), Seq(
      FieldQuery("text", col("text_vec"), "cosine", Array(1f, 0f), 1.0),
      FieldQuery("image", col("image_vec"), "cosine", Array(1f, 0f), 0.5)),
      k = 3).collect()
    val scores = r.map(x => x.getString(0) -> x.getDouble(1)).toMap
    // text ranks: a(0), b(1), c(2); image ranks: b(0), a(1)
    assert(math.abs(scores("a") - (1.0 / 60 + 0.5 / 61)) < 1e-12)
    assert(math.abs(scores("b") - (1.0 / 61 + 0.5 / 60)) < 1e-12)
    assert(math.abs(scores("c") - 1.0 / 62) < 1e-12)
    // a's fused score beats b's (1/60+0.5/61 > 1/61+0.5/60)
    assert(r.head.getString(0) == "a")
  }

  test("fields can use different metrics and dimensions") {
    val df = Seq(
      ("x", Seq(1f, 0f), Seq(1f, 2f, 3f)),
      ("y", Seq(0f, 1f), Seq(3f, 2f, 1f))).toDF("id", "f2", "f3")
    val r = VectorNamespace.fusionSearch(df, col("id"), Seq(
      FieldQuery("f2", col("f2"), "cosine", Array(1f, 0f), 1.0),
      FieldQuery("f3", col("f3"), "euclidean", Array(1f, 2f, 3f), 1.0)),
      k = 2).collect()
    assert(r.map(_.getString(0)).toSet == Set("x", "y"))
    assert(r.head.getString(0) == "x") // wins both legs
  }

  test("two legs may share a field name: each keeps its own rank sequence " +
      "and weight (reference processes FieldQuerys independently)") {
    // same text_vec column probed with two different query vectors
    val r = VectorNamespace.fusionSearch(ns, col("id"), Seq(
      FieldQuery("text", col("text_vec"), "cosine", Array(1f, 0f), 1.0),
      FieldQuery("text", col("text_vec"), "cosine", Array(0f, 1f), 0.5)),
      k = 3).collect()
    val scores = r.map(x => x.getString(0) -> x.getDouble(1)).toMap
    // leg0 ranks (query [1,0]): a(0), b(1), c(2)
    // leg1 ranks (query [0,1]): c(0), b(1), a(2)
    assert(math.abs(scores("a") - (1.0 / 60 + 0.5 / 62)) < 1e-12)
    assert(math.abs(scores("b") - (1.0 / 61 + 0.5 / 61)) < 1e-12)
    assert(math.abs(scores("c") - (1.0 / 62 + 0.5 / 60)) < 1e-12)
  }

  test("empty query list yields an empty frame; fusion plans no cartesian") {
    assert(VectorNamespace.fusionSearch(ns, col("id"), Nil, 5).count() == 0)
    val plan = VectorNamespace.fusionSearch(ns, col("id"), Seq(
      FieldQuery("text", col("text_vec"), "cosine", Array(1f, 0f))),
      k = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
