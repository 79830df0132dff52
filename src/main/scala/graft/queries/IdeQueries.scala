package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.CodeSearch

/** Oracle gates for the IDE-client services (reference:
  * src/services/client/vscode_extension.rs). The documents table stands
  * in for a workspace: its texts are single-line prose with no
  * definition-pattern hits, so each becomes exactly one "other" chunk —
  * which makes the chunk/explode plumbing, the index-status aggregation,
  * and the metadata diff ANSI-replayable. The boundary-splitting chunker,
  * the embedder-backed search, and the stress layout are spec-pinned in
  * CodeSearchSpec (embedder and layout are engine-local arithmetic with
  * no SQL equivalent).
  */
object IdeQueries {

  private def files(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "documents").filter(col("doc_id") < 200)

  private def chunks(s: org.apache.spark.sql.SparkSession, dir: String) =
    CodeSearch.chunk(files(s, dir),
      concat(lit("f"), (col("doc_id") % 10).cast("string")),
      col("lang"), col("text"))

  private val chunksCte =
    """chunks AS (
      |  SELECT 'f' || CAST(doc_id % 10 AS VARCHAR) AS file_path,
      |         lang AS language, text AS content
      |  FROM documents WHERE doc_id < 200
      |)""".stripMargin

  val defs: Map[String, Q] = Map(
    // Workspace chunking plumbing: prose documents produce exactly one
    // 1-based single-line "other" chunk each (the boundary-splitting
    // cases live in CodeSearchSpec where the oracle cannot follow).
    "code_chunk_flat" -> Q(
      s"""WITH $chunksCte
        |SELECT file_path, language,
        |       CAST(1 AS INTEGER) AS start_line,
        |       CAST(1 AS INTEGER) AS end_line,
        |       'other' AS kind, content
        |FROM chunks ORDER BY file_path, content""".stripMargin
    ) { (s, dir) =>
      chunks(s, dir).orderBy(col("file_path"), col("content"))
    },

    // IndexStatus flattened to one row per language (vscode_extension
    // .rs:125-132): global totals + per-language chunk counts, content
    // bytes + packed f32 bytes at dims=16.
    "code_index_status" -> Q(
      s"""WITH $chunksCte,
        |t AS (
        |  SELECT CAST(count(DISTINCT file_path) AS BIGINT) AS indexed_files,
        |         count(*) AS indexed_chunks,
        |         CAST(sum(length(content)) + count(*) * 64 AS BIGINT)
        |           AS index_size_bytes
        |  FROM chunks
        |),
        |l AS (
        |  SELECT language, CAST(count(*) AS BIGINT) AS chunks
        |  FROM chunks GROUP BY language
        |)
        |SELECT t.indexed_files, t.indexed_chunks, t.index_size_bytes,
        |       l.language, l.chunks
        |FROM t CROSS JOIN l
        |ORDER BY l.chunks DESC, l.language""".stripMargin
    ) { (s, dir) =>
      CodeSearch.indexStatus(
          CodeSearch.index(chunks(s, dir), dims = 16), dims = 16)
        .select(col("indexed_files"), col("indexed_chunks"),
          col("index_size_bytes"), explode(col("languages")).as("l"))
        .select(col("indexed_files"), col("indexed_chunks"),
          col("index_size_bytes"), col("l.language").as("language"),
          col("l.chunks").as("chunks"))
        .orderBy(col("chunks").desc, col("language"))
    },

    // RAG word-window chunking (rag_sdk.rs:238-251) replayed in SQL:
    // chunkSize 20 / overlap 5 → step 15; ≤20-word docs stay whole; a
    // window reaching the end stops the walk. The embed/ask stages are
    // engine-local arithmetic pinned in RagSpec.
    "rag_chunks" -> Q(
      """WITH w AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS words,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents WHERE doc_id < 100
        |)
        |SELECT * FROM (
        |  SELECT doc_id, 0 AS chunk_idx, text AS chunk FROM w WHERE n <= 20
        |  UNION ALL
        |  SELECT w.doc_id, CAST(g // 15 AS INT) AS chunk_idx,
        |         array_to_string(words[g+1 : least(g+20, n)], ' ') AS chunk
        |  FROM w CROSS JOIN generate_series(0, 1000, 15) AS gs(g)
        |  WHERE n > 20 AND g < n AND (g = 0 OR g - 15 + 20 < n)
        |) ORDER BY doc_id, chunk_idx""".stripMargin
    ) { (s, dir) =>
      graft.ops.Rag.index(
          Tables.load(s, dir, "documents").filter(col("doc_id") < 100),
          col("doc_id"), col("text"),
          graft.ops.Rag.RagConfig(dims = 8, chunkSize = 20, chunkOverlap = 5))
        .select(col("doc_id").cast("long").as("doc_id"),
          col("chunk_idx").cast("int").as("chunk_idx"),
          col("text").as("chunk"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // Metadata-level collection diff (vscode_extension.rs:410-470):
    // old = docs 0-149 tagged by source; new = docs 50-199 with every
    // 7th source rewritten — added / removed / modified via one
    // full-outer join, never a driver map.
    "code_metadata_diff" -> Q(
      """WITH old AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS id, source AS metadata
        |  FROM documents WHERE doc_id < 150
        |),
        |new AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS id,
        |         CASE WHEN doc_id % 7 = 0 THEN source || '!'
        |              ELSE source END AS metadata
        |  FROM documents WHERE doc_id >= 50 AND doc_id < 200
        |)
        |SELECT coalesce(old.id, new.id) AS id,
        |       CASE WHEN old.id IS NULL THEN 'added'
        |            WHEN new.id IS NULL THEN 'removed'
        |            WHEN old.metadata IS DISTINCT FROM new.metadata
        |              THEN 'modified' END AS change,
        |       old.metadata AS old_metadata, new.metadata AS new_metadata
        |FROM old FULL OUTER JOIN new ON old.id = new.id
        |WHERE CASE WHEN old.id IS NULL THEN 'added'
        |           WHEN new.id IS NULL THEN 'removed'
        |           WHEN old.metadata IS DISTINCT FROM new.metadata
        |             THEN 'modified' END IS NOT NULL
        |ORDER BY id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") < 150)
        .select(col("doc_id").cast("string").as("id"),
          col("source").as("metadata"))
      val newSnap = docs.filter(col("doc_id") >= 50 && col("doc_id") < 200)
        .select(col("doc_id").cast("string").as("id"),
          when(col("doc_id") % 7 === 0, concat(col("source"), lit("!")))
            .otherwise(col("source")).as("metadata"))
      CodeSearch.metadataDiff(oldSnap, newSnap).orderBy(col("id"))
    },
  )
}
