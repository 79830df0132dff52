package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zero-config RAG pipeline (reference: src/services/ai/rag_sdk.rs):
  * word-window chunking with overlap, chunk embedding, retrieval, and
  * prompt assembly with citation-tagged context.
  *
  * Spark re-expression: the chunk index IS a DataFrame — `index` is one
  * narrow chunk-and-explode pass with the engine's deterministic
  * embedder, `search` is the declarative cosine top-k (k-bounded
  * collect), and `removeDoc` / incremental `addDocs` are anti-join /
  * union transformations, so the corpus scales like any table while the
  * reference keeps an in-process map. `ask`'s prompt assembly is
  * driver-side over the k retrieved rows, matching the reference's
  * `[i] text` citation format and `{context}`/`{question}` template
  * substitution exactly.
  */
object Rag {

  final case class RagConfig(dims: Int = 64, chunkSize: Int = 200,
                             chunkOverlap: Int = 50, topK: Int = 3,
                             contextTemplate: String =
                               "Based on the following context, answer " +
                                 "the question.\n\nContext:\n{context}\n\n" +
                                 "Question: {question}")

  final case class RagSource(docId: String, chunkId: String, text: String,
                             distance: Double)

  final case class RagAnswer(context: String, sources: Seq[RagSource],
                             prompt: String, chunksSearched: Int)

  /** Word-window chunking (rag_sdk.rs:238-251), exact: a document of
    * ≤ chunkSize words is ONE chunk of the original text (whitespace
    * preserved); otherwise windows of chunkSize words advance by
    * max(chunkSize − overlap, 1) and stop after the window that reaches
    * the end.
    */
  def chunkText(text: String, chunkSize: Int, overlap: Int): Seq[String] = {
    if (text == null) return Nil
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.length <= chunkSize) return Seq(text)
    val step = math.max(chunkSize - overlap, 1)
    val out = Seq.newBuilder[String]
    var i = 0
    var done = false
    while (i < words.length && !done) {
      val end = math.min(i + chunkSize, words.length)
      out += words.slice(i, end).mkString(" ")
      i += step
      if (end == words.length) done = true
    }
    out.result()
  }

  /** Chunk + embed a (doc_id, text) corpus into the retrieval index:
    * (chunk_id, doc_id, chunk_idx, text, embedding) — chunk ids follow
    * the reference's `{doc}__chunk_{i}` format. One narrow pass.
    */
  def index(docs: DataFrame, idCol: Column, textCol: Column,
            config: RagConfig = RagConfig()): DataFrame = {
    val chunker = udf { (text: String) =>
      chunkText(text, config.chunkSize, config.chunkOverlap).zipWithIndex
    }
    val chunks = docs
      .select(idCol.cast("string").as("doc_id"),
        posexplode(chunker(textCol)).as(Seq("__p", "__c")))
      .select(col("doc_id"), col("__c._2").as("chunk_idx"),
        concat(col("doc_id"), lit("__chunk_"), col("__c._2"))
          .as("chunk_id"),
        col("__c._1").as("text"))
    graft.multimodal.Multimodal.autoEmbed(chunks, "text", config.dims)
  }

  /** Incremental add: new docs chunk/embed and union in; an existing
    * doc_id is replaced (reference `add` overwrites its chunk ids).
    */
  def addDocs(ix: DataFrame, docs: DataFrame, idCol: Column,
              textCol: Column, config: RagConfig = RagConfig()): DataFrame = {
    val incoming = index(docs, idCol, textCol, config)
    ix.join(incoming.select("doc_id").distinct(), Seq("doc_id"),
        "left_anti")
      .unionByName(incoming)
  }

  /** Remove one document's chunks (rag_sdk.rs:169-181). */
  def removeDoc(ix: DataFrame, docId: String): DataFrame =
    ix.filter(col("doc_id") =!= docId)

  /** Raw retrieval (rag_sdk.rs:153-163): cosine top-k over the chunk
    * index with the question embedded by the same deterministic model.
    */
  def search(ix: DataFrame, query: String, k: Int,
             config: RagConfig = RagConfig()): DataFrame = {
    val qv = graft.multimodal.Multimodal.mockEmbed(
      query.getBytes(java.nio.charset.StandardCharsets.UTF_8), config.dims)
    Search.topK(ix, col("embedding"), lit(qv), k, metric = "cosine",
        idCol = "chunk_id")
      .select(col("doc_id"), col("chunk_id"), col("text"),
        round(col("distance"), 6).as("distance"))
  }

  /** Retrieve + format (rag_sdk.rs:130-151): context parts are
    * `[i] text` (1-based) joined by blank lines; the prompt substitutes
    * `{context}` and `{question}` into the template.
    */
  def ask(ix: DataFrame, question: String, topK: Int = 3,
          config: RagConfig = RagConfig()): RagAnswer = {
    val rows = search(ix, question, topK, config).collect()
    val sources = rows.map(r => RagSource(r.getString(0), r.getString(1),
      r.getString(2), r.getDouble(3))).toSeq
    val context = sources.zipWithIndex
      .map { case (s, i) => s"[${i + 1}] ${s.text}" }.mkString("\n\n")
    val prompt = config.contextTemplate
      .replace("{context}", context).replace("{question}", question)
    RagAnswer(context, sources, prompt, sources.length)
  }
}
