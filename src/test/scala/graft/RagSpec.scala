package graft

import org.apache.spark.sql.functions._

import graft.ops.Rag
import graft.ops.Rag._

/** RAG pipeline vs rag_sdk.rs: exact chunk-window arithmetic, index
  * shape, retrieval, citation-formatted prompt assembly, and the
  * incremental add/remove paths.
  */
class RagSpec extends SparkSpec {
  import spark.implicits._

  test("chunkText reproduces the reference window arithmetic") {
    // ≤ chunkSize words: one chunk, ORIGINAL text (whitespace kept)
    assert(chunkText("a  b   c", 5, 2) == Seq("a  b   c"))
    // 10 words, size 4, overlap 2 → step 2, windows at 0,2,4,6 and the
    // loop stops after the window reaching the end
    val words = (1 to 10).map(i => s"w$i").mkString(" ")
    val chunks = chunkText(words, 4, 2)
    assert(chunks == Seq("w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8",
      "w7 w8 w9 w10"))
    // overlap ≥ size: step clamps to 1; the loop breaks once a window
    // reaches the end, so no degenerate trailing "c" window is emitted
    assert(chunkText("a b c", 2, 5) == Seq("a b", "b c"))
    assert(chunkText(null, 4, 2).isEmpty)
  }

  test("index explodes chunks with reference chunk ids; search returns " +
      "the exact chunk at distance 0") {
    val cfg = RagConfig(dims = 16, chunkSize = 4, chunkOverlap = 2)
    val docs = Seq(
      ("d1", (1 to 10).map(i => s"alpha$i").mkString(" ")),
      ("d2", "solo little document")).toDF("id", "text")
    val ix = Rag.index(docs, col("id"), col("text"), cfg)
    assert(ix.columns.toSeq ==
      Seq("doc_id", "chunk_idx", "chunk_id", "text", "embedding"))
    assert(ix.filter(col("doc_id") === "d1").count() == 4)
    assert(ix.filter(col("chunk_id") === "d2__chunk_0").count() == 1)
    val hits = Rag.search(ix, "solo little document", 2, cfg).collect()
    assert(hits.head.getAs[String]("chunk_id") == "d2__chunk_0")
    assert(hits.head.getAs[Double]("distance") == 0.0)
  }

  test("ask assembles 1-based citations and substitutes the template") {
    val cfg = RagConfig(dims = 16)
    val docs = Seq(("rust", "rust is a systems programming language"),
      ("py", "python is for data science")).toDF("id", "text")
    val ix = Rag.index(docs, col("id"), col("text"), cfg)
    val a = Rag.ask(ix, "rust is a systems programming language",
      topK = 2, cfg)
    assert(a.chunksSearched == 2)
    assert(a.sources.head.docId == "rust" && a.sources.head.distance == 0.0)
    assert(a.context.startsWith(
      "[1] rust is a systems programming language\n\n[2] "))
    assert(a.prompt.contains("Context:\n[1] rust"))
    assert(a.prompt.endsWith(
      "Question: rust is a systems programming language"))
  }

  test("addDocs replaces an existing doc's chunks; removeDoc drops them") {
    val cfg = RagConfig(dims = 16)
    val ix = Rag.index(Seq(("d1", "old text"), ("d2", "keep me"))
      .toDF("id", "text"), col("id"), col("text"), cfg)
    val ix2 = Rag.addDocs(ix, Seq(("d1", "new text"))
      .toDF("id", "text"), col("id"), col("text"), cfg)
    val d1 = ix2.filter(col("doc_id") === "d1").collect()
    assert(d1.length == 1 && d1.head.getAs[String]("text") == "new text")
    assert(ix2.count() == 2)
    val ix3 = Rag.removeDoc(ix2, "d1")
    assert(ix3.select("doc_id").as[String].collect().toSeq == Seq("d2"))
  }
}
