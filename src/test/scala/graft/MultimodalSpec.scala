package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Interchange

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media schema wrap + batched decode plumbing") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "abc")).toDF("id", "t")
      .withColumn("t", encode(col("t"), "utf-8"))
    val media = Multimodal.asMedia(docs, "id", "t", "image")
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val decoded = Multimodal.decodeBatched(media, batchSize = 2)
    val rows = decoded.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rows == Map(1L -> 11L, 2L -> 0L, 3L -> 3L))
    val feats = decoded.filter(col("id") === 1)
      .select("features").as[Seq[Float]].head()
    assert(feats.length == 16 && math.abs(feats.sum - 1.0f) < 1e-5)
  }

  test("stub kernels are deterministic and shape-correct") {
    val bytes = "some synthetic binary payload".getBytes
    assert(Multimodal.decodeFeaturesStub(bytes).toSeq ==
      Multimodal.decodeFeaturesStub(bytes).toSeq)
    assert(Multimodal.resizeStub(bytes, 8).length == 8)
    assert(Multimodal.resizeStub("ab".getBytes, 8).length == 2) // no upsample
    val frames = Multimodal.frameSampleStub(bytes, 4, 5)
    assert(frames.length == 4 && frames.forall(_.length <= 5))
  }

  test("mock embedder: deterministic, unit norm, dims honored") {
    val e1 = Multimodal.mockEmbed("hello".getBytes, 16)
    val e2 = Multimodal.mockEmbed("hello".getBytes, 16)
    val e3 = Multimodal.mockEmbed("other".getBytes, 16)
    assert(e1.toSeq == e2.toSeq && e1.toSeq != e3.toSeq)
    assert(math.abs(e1.map(x => x * x).sum - 1.0) < 1e-5)
    assert(Multimodal.mockEmbed("x".getBytes, 384).length == 384)
  }

  test("autoEmbed column + cosine self-similarity") {
    val df = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta")).toDF("id", "text")
    val emb = Multimodal.autoEmbed(df, "text", dims = 8)
    val vecs = emb.select("id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(vecs(1L) == vecs(2L) && vecs(1L) != vecs(3L))
  }

  test("pluggable backend: batched path equals the mock per-row path") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "delta"))
      .toDF("id", "text")
    val viaUdf = Multimodal.autoEmbed(docs, "text", dims = 8)
      .select("id", "embedding").as[(Long, Seq[Float])].collect().toMap
    val viaBackend = Multimodal.autoEmbedWith(docs, "text",
      Multimodal.MockBackend(8), batchSize = 2)
      .select("id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(viaBackend == viaUdf) // same scheme, different plumbing
  }

  test("custom backend plugs in; batches honor batchSize") {
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("id", "text")
      .repartition(1) // one partition → observable batch boundaries
    // backend that tags every vector with its batch's size
    val tagging = new Multimodal.EmbeddingBackend {
      val name = "tagging"; val dims = 2
      def embedBatch(cs: Seq[Array[Byte]]): Seq[Array[Float]] =
        cs.map(_ => Array(cs.size.toFloat, 0f))
    }
    val got = Multimodal.autoEmbedWith(docs, "text", tagging, batchSize = 4)
      .select(element_at(col("embedding"), 1)).as[Float].collect().toSeq
    assert(got.sorted == Seq(2f, 2f, 4f, 4f, 4f, 4f, 4f, 4f, 4f, 4f).sorted)
  }

  test("jsonl interchange roundtrip (columnar.rs schema)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val df = Seq(("a", Array(1f, 2f), """{"k":"1"}"""),
      ("b", Array(3f, 4f), """{"k":"2"}""")).toDF("id", "vector", "metadata")
    Interchange.exportJsonl(df, s"$dir/out", metaCol = Some("metadata"))
    val back = Interchange.importJsonl(spark, s"$dir/out")
    assert(back.count() == 2)
    val row = back.filter(col("id") === "a")
      .select("vector", "metadata").as[(Seq[Float], String)].head()
    assert(row._1 == Seq(1f, 2f) && row._2.contains("\"k\":\"1\""))
  }

  test("whole-database export/import with manifest (database/mod.rs:965,995)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-db").toString
    val docs = Seq(("a", Array(1f, 0f), """{"k":"1"}"""))
      .toDF("id", "vector", "metadata")
    val imgs = Seq(("i1", Array(0f, 1f), """{"k":"2"}"""), ("i2", Array(1f, 1f), """{"k":"3"}"""))
      .toDF("id", "vector", "metadata")
    Interchange.exportAll(Map("docs" -> docs, "imgs" -> imgs), dir)
    val back = Interchange.importAll(spark, dir)
    assert(back.keySet == Set("docs", "imgs"))
    assert(back("docs").count() == 1 && back("imgs").count() == 2)
    assert(back("imgs").filter(col("id") === "i2")
      .select("metadata").as[String].head().contains("\"k\":\"3\""))
  }

  test("bundle export/import with config") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bundle").toString
    val df = Seq(("a", Array(1f, 2f))).toDF("id", "vector")
    Interchange.exportBundle(df, dir, "mycoll", dims = 2, distance = "cosine")
    val (back, cfg) = Interchange.importBundle(spark, dir)
    assert(back.count() == 1)
    assert(cfg == Interchange.BundleConfig("mycoll", 2, "cosine", 1L))
  }
}
