package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `BINARY` content plus a typed metadata struct, processed in
  * batches via `mapPartitions` (the Scala analogue of `mapInPandas` — one
  * iterator pass per partition, chunked into fixed-size batches so peak
  * memory is bounded regardless of partition size).
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels are clearly-marked DETERMINISTIC STUBS (byte-level
  * statistics standing in for pixel/sample decoding). Everything around
  * them — schema, encoders, batch shape, partitioning — is real: swapping
  * a stub for a JNI/codec call changes one function.
  */
object Multimodal {

  /** Typed media metadata (width/height for images, sample_rate/duration
    * for audio, fps/frames for video; unknown fields null).
    */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("modality", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", mediaMetaSchema)))

  /** Wrap a text/binary column as a media table (modality tagged). */
  def asMedia(df: DataFrame, idCol: String, contentCol: String,
              modality: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      lit(modality).as("modality"),
      col(contentCol).cast("binary").as("content"),
      lit(null).cast(mediaMetaSchema).as("meta"))

  // ----------------------------------------------------------- stub kernels

  /** STUB decode: byte histogram (16 buckets) normalized to [0,1] — a
    * deterministic stand-in for pixel decoding. Real impl: image codec.
    */
  def decodeFeaturesStub(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (content == null || content.isEmpty) return hist
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xFF) >> 4) += 1f
      i += 1
    }
    var j = 0
    while (j < 16) { hist(j) /= content.length; j += 1 }
    hist
  }

  /** STUB resize: deterministic byte down-sampling to `target` bytes.
    * Real impl: bilinear pixel resize.
    */
  def resizeStub(content: Array[Byte], target: Int): Array[Byte] = {
    if (content == null || content.length <= target) return content
    val out = new Array[Byte](target)
    var i = 0
    while (i < target) {
      out(i) = content((i.toLong * content.length / target).toInt)
      i += 1
    }
    out
  }

  /** STUB frame sampling: n deterministic, evenly-spaced chunks.
    * Real impl: video keyframe extraction.
    */
  def frameSampleStub(content: Array[Byte], nFrames: Int,
                      frameBytes: Int): Seq[Array[Byte]] = {
    if (content == null || content.isEmpty) return Seq.empty
    (0 until nFrames).map { f =>
      val start = (f.toLong * content.length / nFrames).toInt
      content.slice(start, math.min(start + frameBytes, content.length))
    }
  }

  /** Deterministic hash-based auto-embedder — the same LCG scheme as the
    * reference's Mock backend (reference: src/ml/auto_embed.rs:542-563):
    * seed = content hash, then `state = state * 6364136223846793005 + 1`,
    * value = (state >> 33)/u32::MAX * 2 - 1, L2-normalized. (The seed hash
    * is FNV-1a here; the reference uses Rust's std hasher — both are
    * arbitrary fixed functions, parity is at the scheme level.)
    */
  def mockEmbed(content: Array[Byte], dims: Int): Array[Float] = {
    var h = 0xcbf29ce484222325L // FNV-1a 64
    var i = 0
    while (i < content.length) {
      h ^= (content(i) & 0xFFL); h *= 0x100000001b3L; i += 1
    }
    val out = new Array[Float](dims)
    var state = h
    var j = 0
    while (j < dims) {
      state = state * 6364136223846793005L + 1L
      out(j) = ((state >>> 33).toFloat / 4294967295f) * 2f - 1f
      j += 1
    }
    var norm = 0.0
    j = 0
    while (j < dims) { norm += out(j).toDouble * out(j); j += 1 }
    val n = math.sqrt(norm).toFloat
    if (n > 0) { j = 0; while (j < dims) { out(j) /= n; j += 1 } }
    out
  }

  // --------------------------------------------------- batched mapPartitions

  /** Decode features for a media table in bounded batches: the real
    * plumbing for heavyweight per-row kernels — rows are pulled through the
    * iterator `batchSize` at a time (constant memory) and the kernel runs
    * per batch, exactly how a codec/model call would be amortized.
    * Output: (id, modality, features ARRAY<FLOAT>(16), n_bytes).
    */
  def decodeBatched(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("modality", StringType),
      StructField("features", ArrayType(FloatType)),
      StructField("n_bytes", LongType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    media.select("id", "modality", "content").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "model call" per batch — the stub loops, a codec would vectorize
        batch.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          Row(r.getLong(0), r.getString(1),
            decodeFeaturesStub(content),
            if (content == null) 0L else content.length.toLong)
        }
      }
    }(enc)
  }

  private val embedUdf = udf((b: Array[Byte], dims: Int) =>
    if (b == null) null else mockEmbed(b, dims))

  /** Auto-embed a binary/text column (reference insert_auto_text path:
    * src/collection/insert.rs:296).
    */
  def autoEmbed(df: DataFrame, contentCol: String, dims: Int,
                outCol: String = "embedding"): DataFrame =
    df.withColumn(outCol, embedUdf(col(contentCol).cast("binary"), lit(dims)))

  // ------------------------------------------------- pluggable backends

  /** Pluggable embedding backend (reference: src/ml/auto_embed.rs:44-140 —
    * EmbeddingConfig with OpenAI / Cohere / Ollama / Mock providers). The
    * real providers are external HTTP services, rightly out of scope for a
    * hermetic engine; this trait is the CONTRACT they plug into:
    * batch-oriented (one model/API call per batch — the amortization unit
    * every real provider bills by) and Serializable (the backend ships to
    * executors inside the mapPartitions closure).
    */
  trait EmbeddingBackend extends Serializable {
    def name: String
    def dims: Int
    /** Embed one batch with one model call; null content → null vector. */
    def embedBatch(contents: Seq[Array[Byte]]): Seq[Array[Float]]
  }

  /** The reference's Mock provider (auto_embed.rs:542) as a backend. */
  final case class MockBackend(dims: Int) extends EmbeddingBackend {
    val name = "mock"
    def embedBatch(contents: Seq[Array[Byte]]): Seq[Array[Float]] =
      contents.map(c => if (c == null) null else mockEmbed(c, dims))
  }

  /** Auto-embed through a pluggable backend: rows stream through
    * `mapPartitions` in `batchSize` groups with ONE `embedBatch` call per
    * group — the plumbing a real OpenAI/Cohere/Ollama provider needs
    * (constant memory, amortized calls), with the mock backend standing in
    * where this environment has no network.
    */
  def autoEmbedWith(df: DataFrame, contentCol: String,
                    backend: EmbeddingBackend,
                    outCol: String = "embedding",
                    batchSize: Int = 64): DataFrame = {
    val in = df.withColumn("__bytes", col(contentCol).cast("binary"))
    val outSchema = in.schema.add(StructField(outCol, ArrayType(FloatType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = backend.embedBatch(
          batch.map(_.getAs[Array[Byte]]("__bytes")))
        batch.zip(vecs).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ (v: Any))
        }
      }
    }(enc).drop("__bytes")
  }
}
