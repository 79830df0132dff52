package graft

import graft.ops.CrossModal
import graft.ops.CrossModal.{Engine, Fusion, Modality, Projection}

class CrossModalSpec extends SparkSpec {
  import spark.implicits._

  private def modalities = {
    val text = Seq(
      ("t1", Array(1f, 0f)), ("t2", Array(0.8f, 0.2f)), ("t3", Array(0f, 1f)))
      .toDF("id", "vector")
    val image = Seq(
      ("i1", Array(0f, 1f, 0f)), ("i2", Array(1f, 0f, 0f)))
      .toDF("id", "vector")
    Seq(Modality("text", text, dims = 2), Modality("image", image, dims = 3))
  }

  test("projection matrix aligns query spaces (row-major target×source)") {
    // maps 2-d text space into 3-d image space: (x, y) -> (y, x, 0)
    val p = Projection(Array(0f, 1f, 1f, 0f, 0f, 0f), sourceDim = 2, targetDim = 3)
    assert(p(Array(1f, 0f)).toSeq == Seq(0f, 1f, 0f))
    val e = new Engine(modalities)
    e.registerProjection("text", "image", p)
    // query [1,0] in text space → [0,1,0] in image space → i1 is exact
    val got = e.search(spark, Array(1f, 0f), Seq("image"), k = 1,
      queryModality = Some("text"))
      .select("id").as[String].collect().toSeq
    assert(got == Seq("i1"))
    // dims validation on registration
    assertThrows[IllegalArgumentException](
      e.registerProjection("image", "text", p))
  }

  test("round-robin fusion interleaves per-modality lists") {
    val e = new Engine(modalities, fusion = Fusion.RoundRobin)
    val got = e.search(spark, Array(1f, 0f), Seq("text", "image"), k = 4)
      .select("id").as[String].collect().toSeq
    // text list: t1, t2, t3 (cosine sim to [1,0]); image list: i2, i1
    // (query truncated/padded to 3d = [1,0,0]); interleave: t1, i2, t2, i1
    assert(got == Seq("t1", "i2", "t2", "i1"))
  }

  test("score-sort fusion with per-modality weights") {
    val e = new Engine(modalities, weights = Map("image" -> 0.5),
      fusion = Fusion.ScoreSort)
    val got = e.search(spark, Array(1f, 0f), Seq("text", "image"), k = 3)
      .select("id", "score").as[(String, Double)].collect().toSeq
    // t1 sim 1.0; i2 sim 1.0×0.5 = 0.5; t2 sim ≈0.970
    assert(got.map(_._1) == Seq("t1", "t2", "i2"))
  }

  test("RRF fusion sums reciprocal ranks across lists") {
    val e = new Engine(modalities, fusion = Fusion.Rrf(60.0))
    val got = e.search(spark, Array(1f, 0f), Seq("text", "image"), k = 2)
      .select("id", "score").as[(String, Double)].collect().toSeq
    // both rank-1 entries score 1/61 — tie broken by id: i2 before t1
    assert(got.map(_._1) == Seq("i2", "t1"))
    assert(math.abs(got.head._2 - 1.0 / 61.0) < 1e-9)
  }
}
