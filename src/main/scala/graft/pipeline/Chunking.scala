package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text chunking for ingestion/RAG pipelines (reference:
  * src/search/pipeline.rs — ChunkStrategy :502-512, ChunkerConfig
  * :522-552, chunk_text :646-758). Three strategies with the reference's
  * exact rules:
  *
  *   - Sentence: split inclusive on `.` `!` `?`, pack sentences up to
  *     chunkSize, carry `overlap` trailing characters into the next chunk;
  *   - RecursiveCharacter (LangChain-style): try separators in order
  *     ("\n\n", "\n", ". ", " "), pack parts with the separator re-joined,
  *     overlap carried; fall back to fixed-size when no separator splits;
  *   - FixedSize: sliding character windows of `chunkSize` stepping
  *     `chunkSize − overlap`.
  *
  * Chunks are trimmed and empties dropped. Lengths are measured in
  * CHARACTERS (the reference measures bytes; identical on ASCII, safer on
  * multi-byte text — divergence documented).
  *
  * The per-document function is pure Scala in one compiled UDF pass;
  * [[chunk]] distributes it with posexplode — a narrow map, no shuffle,
  * the scale shape for chunking 100 TB of documents.
  */
object Chunking {

  sealed trait Strategy
  object Strategy {
    case object Sentence extends Strategy
    case object RecursiveCharacter extends Strategy
    case object FixedSize extends Strategy
  }

  final case class Config(
      strategy: Strategy = Strategy.RecursiveCharacter,
      chunkSize: Int = 512,
      chunkOverlap: Int = 50,
      separators: Seq[String] = Seq("\n\n", "\n", ". ", " "))

  /** chunk_text (pipeline.rs:646-656). */
  def chunkText(text: String, config: Config = Config()): Seq[String] =
    config.strategy match {
      case Strategy.Sentence =>
        chunkBySentence(text, config.chunkSize, config.chunkOverlap)
      case Strategy.RecursiveCharacter =>
        recursiveCharacterSplit(text, config.separators, config.chunkSize,
          config.chunkOverlap)
      case Strategy.FixedSize =>
        fixedSizeChunk(text, config.chunkSize, config.chunkOverlap)
    }

  /** pipeline.rs:658-688 — split inclusive on sentence enders, pack, carry
    * overlap from the end of the emitted chunk.
    */
  private[pipeline] def chunkBySentence(text: String, maxSize: Int,
                                        overlap: Int): Seq[String] = {
    if (text == null) return Seq.empty
    val sentences = splitInclusive(text, c => c == '.' || c == '!' || c == '?')
    if (sentences.isEmpty)
      return if (text.isEmpty) Seq.empty else Seq(text)
    val chunks = Seq.newBuilder[String]
    var current = ""
    sentences.foreach { sentence =>
      if (current.nonEmpty && current.length + sentence.length > maxSize) {
        chunks += current.trim
        current =
          if (overlap > 0 && current.length > overlap)
            current.substring(current.length - overlap)
          else ""
      }
      current += sentence
    }
    if (current.trim.nonEmpty) chunks += current.trim
    chunks.result()
  }

  /** pipeline.rs:690-733 — first separator that splits wins; parts are
    * re-joined with the separator while packing.
    */
  private[pipeline] def recursiveCharacterSplit(text: String,
                                                separators: Seq[String],
                                                maxSize: Int,
                                                overlap: Int): Seq[String] = {
    if (text == null) return Seq.empty
    if (text.length <= maxSize) return Seq(text)
    separators.foreach { sep =>
      val parts = text.split(java.util.regex.Pattern.quote(sep), -1)
      if (parts.length > 1) {
        val chunks = Seq.newBuilder[String]
        var current = ""
        parts.foreach { part =>
          if (current.nonEmpty &&
              current.length + sep.length + part.length > maxSize) {
            chunks += current.trim
            current =
              if (overlap > 0 && current.length > overlap)
                current.substring(current.length - overlap)
              else ""
          }
          if (current.nonEmpty) current += sep
          current += part
        }
        if (current.trim.nonEmpty) chunks += current.trim
        return chunks.result()
      }
    }
    fixedSizeChunk(text, maxSize, overlap)
  }

  /** pipeline.rs:735-758 — windows of `size` stepping `size − overlap`. */
  private[pipeline] def fixedSizeChunk(text: String, size: Int,
                                       overlap: Int): Seq[String] = {
    if (text == null || text.isEmpty || size == 0) return Seq.empty
    val step = if (size > overlap) size - overlap else 1
    val chunks = Seq.newBuilder[String]
    var start = 0
    while (start < text.length) {
      val end = math.min(start + size, text.length)
      val c = text.substring(start, end).trim
      if (c.nonEmpty) chunks += c
      start += step
    }
    chunks.result()
  }

  /** Rust's split_inclusive: segments INCLUDE the matching terminator; a
    * trailing segment without one is kept.
    */
  private def splitInclusive(s: String, isEnd: Char => Boolean): Seq[String] = {
    val out = Seq.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (isEnd(s.charAt(i))) { out += s.substring(start, i + 1); start = i + 1 }
      i += 1
    }
    if (start < s.length) out += s.substring(start)
    out.result()
  }

  /** Distributed chunking: (idCol, chunk_index, chunk) — one narrow UDF
    * pass + posexplode per document.
    */
  def chunk(df: DataFrame, idCol: Column, textCol: Column,
            config: Config = Config()): DataFrame = {
    val chunker = udf((t: String) => chunkText(t, config).toArray)
    df.select(idCol.as("doc_id"),
        posexplode(chunker(textCol)).as(Seq("chunk_index", "chunk")))
  }
}
