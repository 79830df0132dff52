package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.MultimodalFusion
import graft.ops.MultimodalFusion.{Modality, Strategy}

class MultimodalFusionSpec extends SparkSpec {

  // docs: a has both modalities, b text-only, c image-only (null), d has an
  // image vector at the WRONG dimensionality (must be skipped, not scored)
  private def docs = {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("text_vec", ArrayType(FloatType)),
      StructField("img_vec", ArrayType(FloatType))))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("a", Seq(1f, 0f), Seq(0f, 1f)),
        Row("b", Seq(0f, 1f), null),
        Row("c", null, Seq(1f, 0f)),
        Row("d", Seq(0.5f, 0.5f), Seq(1f, 0f, 0f))),
      schema)
  }

  private val mods = Map(
    "text" -> Modality("text_vec"),
    "image" -> Modality("img_vec"))
  private val q = Map(
    "text" -> Array(1f, 0f),
    "image" -> Array(1f, 0f))

  test("weighted sum skips missing/mismatched modalities, normalizes by present weight") {
    val got = MultimodalFusion.search(docs, "id", mods, q, k = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a: (cos([1,0],[1,0]) + cos([0,1],[1,0]))/2 = (0+1)/2
    assert(math.abs(got("a") - 0.5) < 1e-6)
    // b: text only, cos([0,1],[1,0])=1 ; c: image only, cos([1,0],[1,0])=0 ;
    // d: text only (img dims mismatch)
    assert(math.abs(got("b") - 1.0) < 1e-6)
    assert(math.abs(got("c") - 0.0) < 1e-6)
    assert(math.abs(got("d") - 0.29289) < 1e-4)
  }

  test("min/max distance strategies") {
    val mn = MultimodalFusion.search(docs, "id", mods, q, 10, Strategy.MinDistance)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(mn("a") - 0.0) < 1e-6) // min(0, 1)
    val mx = MultimodalFusion.search(docs, "id", mods, q, 10, Strategy.MaxDistance)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(mx("a") - 1.0) < 1e-6) // max(0, 1)
    // single-modality rows pass through under both
    assert(math.abs(mn("b") - 1.0) < 1e-6 && math.abs(mx("b") - 1.0) < 1e-6)
  }

  test("rrf-over-distances kernel: 1 / sum(1/(60+d))") {
    val got = MultimodalFusion.search(docs, "id", mods, q, 10, Strategy.Rrf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expectA = 1.0 / (1.0 / 60.0 + 1.0 / 61.0)
    assert(math.abs(got("a") - expectA) < 1e-9)
  }

  test("weight overrides beat modality defaults") {
    val got = MultimodalFusion.search(docs, "id", mods, q, 10,
      Strategy.WeightedSum, weightOverrides = Map("text" -> 3.0))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a: (3·0 + 1·1)/4 = 0.25
    assert(math.abs(got("a") - 0.25) < 1e-6)
  }

  test("physical plan: one TakeOrderedAndProject over the scan, no shuffle") {
    import org.apache.spark.sql.functions._
    val emb = sf("embeddings")
      .select(col("vec_id"), col("embedding").as("full_vec"),
        slice(col("embedding"), 1, 16).as("head_vec"))
    val q0 = Array.fill(64)(0.1f)
    val plan = MultimodalFusion.search(emb, "vec_id",
      Map("full" -> Modality("full_vec"), "head" -> Modality("head_vec")),
      Map("full" -> q0, "head" -> q0.take(16)), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-k physical operator:\n$plan")
    assert(!plan.contains("Exchange"),
      s"fused scoring must not shuffle (scales as a narrow map):\n$plan")
  }

  test("concatenate strategy uses only shared modalities, sorted-name order") {
    val got = MultimodalFusion.search(docs, "id", mods, q, 10, Strategy.Concatenate)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a: cosine([qi ++ qt], [img ++ text]) = cos([1,0,1,0],[0,1,1,0]) = 0.5
    assert(math.abs(got("a") - 0.5) < 1e-6)
    // b: text leg only → cos([1,0],[0,1]) = 1
    assert(math.abs(got("b") - 1.0) < 1e-6)
  }
}
