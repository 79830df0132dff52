package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** IDE-client services (reference: src/services/client/vscode_extension.rs):
  * the semantic code-search protocol, workspace chunking + indexing, the
  * IDE query builder, the stress-majorization layout for the vector-space
  * view, the metadata-level collection diff the extension's diff viewer
  * renders, and the extension manifest.
  *
  * Spark re-expression: the reference holds chunks in its in-process
  * store; here the chunk index IS a DataFrame — chunking is one narrow
  * pass (a per-file UDF splitting on definition boundaries, exploded),
  * embeddings ride the engine's deterministic content embedder
  * ([[Multimodal.mockEmbed]] — the same FNV/LCG the auto-embed path
  * uses), and a search compiles its file-glob and language filters to
  * predicates applied BEFORE scoring, so they push into the scan and
  * prune at 100 TB like any metadata filter. Only the 2-D layout is
  * driver-side — it is O(n²·iterations) pairwise stress majorization by
  * construction (vscode_extension.rs documents the ≤10k bound), so the
  * input contract is a bounded, already-sampled set.
  */
object CodeSearch {

  // ------------------------------------------------------------- chunking

  /** ChunkKind (vscode_extension.rs:92). */
  val kinds = Seq("function", "struct", "enum", "trait", "impl", "module",
    "comment", "other")

  private val defPatterns: Seq[(String, String)] = Seq(
    // (kind, line regex) — first match wins, per-language keywords folded
    // into one alternation per kind
    ("function", """^\s*(pub\s+)?(async\s+)?(private\s+|protected\s+)?(def|fn|func|function)\s+\w.*"""),
    ("impl", """^\s*impl[\s<].*"""),
    ("trait", """^\s*(pub\s+)?(sealed\s+)?(trait|interface)\s+\w.*"""),
    ("enum", """^\s*(pub\s+)?enum\s+\w.*"""),
    ("struct", """^\s*(pub\s+)?(case\s+class|class|struct)\s+\w.*"""),
    ("module", """^\s*(pub\s+)?(object|mod|module)\s+\w.*"""))

  private def kindOfLine(line: String): Option[String] =
    defPatterns.collectFirst { case (k, p) if line.matches(p) => k }

  private val commentLine = """^\s*(//|#|/\*|\*|--).*"""

  /** Split one file into definition-boundary chunks: a chunk opens at
    * each definition line and runs to the line before the next one; a
    * leading run of lines before the first definition becomes a comment
    * chunk (when it is all comments/blank) or an "other" chunk.
    * Returns (start_line, end_line, kind, content), 1-based inclusive.
    */
  def chunkFile(content: String): Seq[(Int, Int, String, String)] = {
    if (content == null || content.isEmpty) return Nil
    val lines = content.split("\n", -1)
    val starts = lines.zipWithIndex.collect {
      case (l, i) if kindOfLine(l).isDefined => i
    }
    val bounds: Seq[(Int, Int, String)] =
      if (starts.isEmpty) Seq((0, lines.length - 1, "other"))
      else {
        val lead =
          if (starts.head == 0) Nil
          else {
            val leadLines = lines.slice(0, starts.head)
            val kind = if (leadLines.forall(l =>
              l.isBlank || l.matches(commentLine))) "comment" else "other"
            Seq((0, starts.head - 1, kind))
          }
        lead ++ starts.zipWithIndex.map { case (s, i) =>
          val end = if (i + 1 < starts.length) starts(i + 1) - 1
                    else lines.length - 1
          (s, end, kindOfLine(lines(s)).get)
        }
      }
    bounds.map { case (s, e, k) =>
      (s + 1, e + 1, k, lines.slice(s, e + 1).mkString("\n"))
    }.filter(_._4.trim.nonEmpty)
  }

  private val chunkUdf = udf { (content: String) =>
    chunkFile(content).map { case (s, e, k, c) => (s, e, k, c) }
  }

  /** Chunk a workspace: (file_path, language, content) rows → one row per
    * CodeChunk (vscode_extension.rs:81-89). One narrow pass + explode; no
    * shuffle.
    */
  def chunk(files: DataFrame, pathCol: Column, languageCol: Column,
            contentCol: Column): DataFrame =
    files.select(pathCol.as("file_path"), languageCol.as("language"),
        explode(chunkUdf(contentCol)).as("__c"))
      .select(col("file_path"), col("language"),
        col("__c._1").as("start_line"), col("__c._2").as("end_line"),
        col("__c._3").as("kind"), col("__c._4").as("content"))

  // ------------------------------------------------------------- indexing

  /** Embed chunks with the engine's deterministic content embedder —
    * the chunk index: chunk columns + `embedding`.
    */
  def index(chunks: DataFrame, dims: Int = 64): DataFrame =
    Multimodal.autoEmbed(chunks, "content", dims)

  /** IndexStatus (vscode_extension.rs:125-132): files, chunks, byte size
    * (content + packed f32 vectors), per-language chunk counts sorted
    * descending. Two grouped aggregations, each over bounded output
    * (1 row / |languages| rows), joined by broadcast.
    */
  def indexStatus(ix: DataFrame, dims: Int = 64): DataFrame = {
    val totals = ix.agg(
      countDistinct(col("file_path")).as("indexed_files"),
      count(lit(1)).as("indexed_chunks"),
      (coalesce(sum(length(col("content")).cast("long")), lit(0L)) +
        count(lit(1)) * dims * 4L).as("index_size_bytes"))
    val langs = ix.groupBy(col("language"))
      .agg(count(lit(1)).as("chunks"))
      .agg(transform(
        sort_array(collect_list(
          struct((-col("chunks")).as("neg"), col("language")))),
        e => struct(e.getField("language").as("language"),
          (-e.getField("neg")).as("chunks"))).as("languages"))
    totals.crossJoin(broadcast(langs))
  }

  /** SearchRequest (vscode_extension.rs:96-103). */
  final case class SearchRequest(query: String, maxResults: Int = 10,
                                 fileFilter: Option[String] = None,
                                 languageFilter: Option[String] = None)

  /** Glob → SQL LIKE pattern: `*` → `%`, `?` → `_`, literal `%`/`_`
    * escaped. (The extension's file filter is a glob; LIKE compiles to a
    * pushable predicate.)
    */
  def globToLike(glob: String): String =
    glob.flatMap {
      case '*' => "%"
      case '?' => "_"
      case '%' => "\\%"
      case '_' => "\\_"
      case c => c.toString
    }

  /** Semantic code search (the SearchRequest → SearchResponse protocol):
    * the query embeds driver-side with the same embedder as the index;
    * file/language filters apply BEFORE scoring (pushed predicates);
    * results carry the reference's SearchResult fields with
    * score = 1/(1+distance) and a 120-char preview.
    */
  def search(ix: DataFrame, req: SearchRequest, dims: Int = 64): DataFrame = {
    require(req.query.nonEmpty, "Query text is required")
    require(req.maxResults >= 1, "k must be at least 1")
    val qv = Multimodal.mockEmbed(
      req.query.getBytes(java.nio.charset.StandardCharsets.UTF_8), dims)
    val filtered = Seq(
      req.fileFilter.map(g => col("file_path").like(globToLike(g))),
      req.languageFilter.map(l => col("language") === l)
    ).flatten.foldLeft(ix)(_ filter _)
    Search.topK(filtered, col("embedding"), lit(qv), req.maxResults,
        metric = "cosine", idCol = "file_path")
      .withColumn("preview", substring(col("content"), 1, 120))
      .withColumn("score", round(lit(1.0) / (lit(1.0) + col("distance")), 6))
      .select(col("file_path"), col("start_line"), col("end_line"),
        col("preview"), col("score"), col("language"), col("kind"))
  }

  // -------------------------------------------------------- query builder

  /** The IDE's visual query builder (vscode_extension.rs:279-373):
    * immutable withers over the reference defaults, `validate`, and the
    * SearchRequest projection.
    */
  final case class IdeQueryBuilder(queryText: String = "", k: Int = 10,
                                   filter: Option[String] = None,
                                   distance: String = "cosine",
                                   fileFilter: Option[String] = None,
                                   languageFilter: Option[String] = None,
                                   includeScores: Boolean = true,
                                   includeVectors: Boolean = false) {
    def withK(n: Int): IdeQueryBuilder = copy(k = n)
    def withFilter(f: String): IdeQueryBuilder = copy(filter = Some(f))
    def withFileFilter(p: String): IdeQueryBuilder = copy(fileFilter = Some(p))
    def withLanguage(l: String): IdeQueryBuilder =
      copy(languageFilter = Some(l))
    def toSearchRequest: SearchRequest =
      SearchRequest(queryText, k, fileFilter, languageFilter)
    def validate(): Either[String, Unit] =
      if (queryText.isEmpty) Left("Query text is required")
      else if (k < 1) Left("k must be at least 1")
      else Right(())
  }
  object IdeQueryBuilder {
    def apply(query: String): IdeQueryBuilder =
      new IdeQueryBuilder(queryText = query)
  }

  // ---------------------------------------------------------- 2-D layout

  final case class ProjectionConfig(nIterations: Int = 200,
                                    learningRate: Double = 1.0)

  /** Stress-majorization 2-D layout (vscode_extension.rs:179-263),
    * reproduced exactly: pairwise euclidean distances; ring
    * initialization (angle 2πi/n, radius = mean distance of row i);
    * per-iteration 1/d² weighted displacement with simultaneous update.
    * Driver-side by contract — the algorithm is O(n²·iters) global
    * relaxation; callers pass a bounded sample (≤ 10k, enforced).
    * Deterministic: no randomness anywhere.
    */
  def projectLayout(vectors: Array[Array[Float]], ids: Array[String],
                    config: ProjectionConfig = ProjectionConfig())
      : Seq[(String, Double, Double)] = {
    val n = vectors.length
    require(n <= 10000, s"layout projection is bounded to 10k points, got $n")
    if (n == 0) return Nil
    if (n == 1) return Seq((ids(0), 0.0, 0.0))
    val dist = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i + 1 until n) {
      var s = 0.0
      var d = 0
      while (d < math.min(vectors(i).length, vectors(j).length)) {
        val diff = vectors(i)(d).toDouble - vectors(j)(d).toDouble
        s += diff * diff; d += 1
      }
      val e = math.sqrt(s)
      dist(i)(j) = e; dist(j)(i) = e
    }
    var pos = Array.tabulate(n) { i =>
      val angle = 2.0 * math.Pi * i / n
      val radius = dist(i).sum / n
      (radius * math.cos(angle), radius * math.sin(angle))
    }
    for (_ <- 0 until config.nIterations) {
      val next = pos.clone()
      for (i <- 0 until n) {
        var dx = 0.0; var dy = 0.0; var wSum = 0.0
        for (j <- 0 until n if j != i) {
          val target = dist(i)(j)
          if (target >= 1e-10) {
            val cdx = pos(i)._1 - pos(j)._1
            val cdy = pos(i)._2 - pos(j)._2
            val cur = math.max(math.sqrt(cdx * cdx + cdy * cdy), 1e-10)
            val w = 1.0 / (target * target)
            val scale = (target - cur) / cur
            dx += w * scale * cdx; dy += w * scale * cdy; wSum += w
          }
        }
        if (wSum > 0.0) {
          val lr = config.learningRate / wSum
          next(i) = (next(i)._1 + lr * dx, next(i)._2 + lr * dy)
        }
      }
      pos = next
    }
    pos.zipWithIndex.map { case ((x, y), i) => (ids(i), x, y) }.toSeq
  }

  // ------------------------------------------------------- metadata diff

  /** The extension's collection-diff viewer (vscode_extension.rs:410-470)
    * — metadata-level: added / removed / modified between two snapshots.
    * Distributed re-expression: one full-outer join on id (the reference
    * builds two driver HashMaps), so it diffs collections of any size.
    * Output: (id, change, old_metadata, new_metadata) with change ∈
    * {added, removed, modified}; unchanged rows drop out.
    */
  def metadataDiff(oldDf: DataFrame, newDf: DataFrame,
                   idCol: String = "id",
                   metaCol: String = "metadata"): DataFrame = {
    val o = oldDf.select(col(idCol).cast("string").as("id"),
      col(metaCol).cast("string").as("old_metadata"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(idCol).cast("string").as("id"),
      col(metaCol).cast("string").as("new_metadata"),
      lit(true).as("__in_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("old_metadata") <=> col("new_metadata")), "modified"))
      .filter(col("change").isNotNull)
      .select(col("id"), col("change"), col("old_metadata"),
        col("new_metadata"))
  }

  /** DiffSummary (vscode_extension.rs:404-408): one grouped count. */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.agg(
      sum(when(col("change") === "added", 1L).otherwise(0L))
        .as("total_added"),
      sum(when(col("change") === "removed", 1L).otherwise(0L))
        .as("total_removed"),
      sum(when(col("change") === "modified", 1L).otherwise(0L))
        .as("total_modified"))

  // ------------------------------------------------------------ manifest

  /** ExtensionManifest (vscode_extension.rs:23-77) with this engine's
    * identifiers; same structure, package.json-ready.
    */
  final case class ExtensionManifest(
      name: String = "graft-search",
      displayName: String = "Graft Semantic Search",
      description: String = "Semantic code search powered by the graft engine",
      version: String = "0.1.0",
      publisher: String = "graft",
      categories: Seq[String] = Seq("Search", "Other"),
      activationEvents: Seq[String] =
        Seq("onCommand:graft.search", "onCommand:graft.index"),
      commands: Seq[(String, String)] = Seq(
        "graft.search" -> "Graft: Semantic Search",
        "graft.index" -> "Graft: Index Workspace",
        "graft.status" -> "Graft: Show Index Status"),
      dimensions: Int = 64,
      excludePatterns: Seq[String] =
        Seq("**/node_modules/**", "**/target/**"),
      maxFileSize: Long = 100000L)

  /** package.json for the manifest (vscode_extension.rs:134-137). */
  def packageJson(m: ExtensionManifest = ExtensionManifest()): String = {
    val mapper = new ObjectMapper()
    val o = mapper.createObjectNode()
    o.put("name", m.name).put("displayName", m.displayName)
      .put("description", m.description).put("version", m.version)
      .put("publisher", m.publisher)
    val cats = o.putArray("categories"); m.categories.foreach(cats.add)
    val act = o.putArray("activationEvents")
    m.activationEvents.foreach(act.add)
    val contributes = o.putObject("contributes")
    val cmds = contributes.putArray("commands")
    m.commands.foreach { case (cmd, title) =>
      cmds.addObject().put("command", cmd).put("title", title)
    }
    val cfg = contributes.putObject("configuration")
    cfg.put("type", "object").put("title", m.displayName)
    val props = cfg.putObject("properties")
    props.putObject(s"${m.publisher}.dimensions")
      .put("type", "number").put("default", m.dimensions)
      .put("description", "Embedding dimensions")
    val ex = props.putObject(s"${m.publisher}.excludePatterns")
    ex.put("type", "array").put("description", "Glob patterns to exclude")
    val defaults = ex.putArray("default")
    m.excludePatterns.foreach(defaults.add)
    props.putObject(s"${m.publisher}.maxFileSize")
      .put("type", "number").put("default", m.maxFileSize)
      .put("description", "Max file size in bytes")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }
}
