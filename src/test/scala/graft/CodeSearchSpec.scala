package graft

import org.apache.spark.sql.functions._

import graft.ops.CodeSearch
import graft.ops.CodeSearch._

/** IDE-client services vs vscode_extension.rs: chunking, the search
  * protocol with pushed filters, the stress-majorization layout
  * arithmetic, the metadata diff, the query builder, and the manifest.
  */
class CodeSearchSpec extends SparkSpec {
  import spark.implicits._

  private val scalaFile =
    """// graft sample
      |// utilities
      |
      |object Util {
      |  def add(a: Int, b: Int): Int = a + b
      |  def sub(a: Int, b: Int): Int = a - b
      |}
      |case class Point(x: Int, y: Int)
      |trait Shape { def area: Double }
      |""".stripMargin

  private val rustFile =
    """fn main() {
      |    println!("hi");
      |}
      |struct Config { dims: usize }
      |enum Mode { Fast, Slow }
      |impl Config {
      |    fn new() -> Self { Config { dims: 4 } }
      |}
      |""".stripMargin

  private def workspace() = Seq(
    ("src/util.scala", "scala", scalaFile),
    ("src/main.rs", "rust", rustFile),
    ("README.md", "markdown", "# readme\njust prose\n")
  ).toDF("path", "lang", "text")

  test("chunkFile splits on definition boundaries with 1-based lines " +
      "and classifies kinds") {
    val chunks = CodeSearch.chunkFile(scalaFile)
    val kinds = chunks.map(_._3)
    // leading comment block, object, two defs, case class, trait
    assert(kinds == Seq("comment", "module", "function", "function",
      "struct", "trait"))
    val lead = chunks.head
    assert(lead._1 == 1 && lead._2 == 3) // comments + blank line
    val obj = chunks(1)
    assert(obj._1 == 4 && obj._4.startsWith("object Util"))
    val rust = CodeSearch.chunkFile(rustFile).map(_._3)
    // the fn nested in the impl block opens its own chunk — definition
    // lines split regardless of nesting
    assert(rust == Seq("function", "struct", "enum", "impl", "function"))
    // no definitions → one "other" chunk; empty → none
    assert(CodeSearch.chunkFile("just prose\n").map(_._3) == Seq("other"))
    assert(CodeSearch.chunkFile("").isEmpty)
  }

  test("chunk explodes a workspace without shuffling") {
    val chunks = CodeSearch.chunk(workspace(), col("path"), col("lang"),
      col("text"))
    assert(chunks.columns.toSeq == Seq("file_path", "language",
      "start_line", "end_line", "kind", "content"))
    assert(chunks.filter(col("language") === "scala").count() == 6)
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("search: filters apply before scoring, results carry the protocol " +
      "fields, and the exact content chunk ranks first") {
    val ix = CodeSearch.index(CodeSearch.chunk(workspace(), col("path"),
      col("lang"), col("text")), dims = 16)
    // query = the exact text of one chunk → distance 0 under the shared
    // deterministic embedder → it must rank first with score 1
    val target = "case class Point(x: Int, y: Int)"
    val hits = CodeSearch.search(ix, SearchRequest(target, maxResults = 3),
      dims = 16).collect()
    assert(hits.nonEmpty)
    assert(hits.head.getAs[String]("preview") == target)
    assert(hits.head.getAs[Double]("score") == 1.0)
    assert(hits.head.getAs[String]("kind") == "struct")
    // language filter excludes the scala chunk entirely
    val rustOnly = CodeSearch.search(ix,
      SearchRequest(target, 5, languageFilter = Some("rust")), 16).collect()
    assert(rustOnly.forall(_.getAs[String]("language") == "rust"))
    // glob file filter compiles to LIKE and prunes
    val scalaOnly = CodeSearch.search(ix,
      SearchRequest(target, 5, fileFilter = Some("src/*.scala")), 16)
    assert(scalaOnly.collect()
      .forall(_.getAs[String]("file_path") == "src/util.scala"))
    assert(globToLike("src/*.sc?la") == "src/%.sc_la")
  }

  test("indexStatus aggregates files, chunks, bytes, and per-language " +
      "counts descending") {
    val ix = CodeSearch.index(CodeSearch.chunk(workspace(), col("path"),
      col("lang"), col("text")), dims = 16)
    val st = CodeSearch.indexStatus(ix, dims = 16).head()
    assert(st.getAs[Long]("indexed_files") == 3)
    assert(st.getAs[Long]("indexed_chunks") == ix.count())
    assert(st.getAs[Long]("index_size_bytes") >
      st.getAs[Long]("indexed_chunks") * 16 * 4)
    val langs = st.getSeq[org.apache.spark.sql.Row](3)
    assert(langs.head.getAs[String]("language") == "scala") // most chunks
    assert(langs.map(_.getAs[Long]("chunks")).sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("projectLayout replays the reference stress-majorization " +
      "arithmetic deterministically") {
    // hand-checkable n=1/0 contracts
    assert(CodeSearch.projectLayout(Array(), Array()) == Nil)
    assert(CodeSearch.projectLayout(Array(Array(1f, 2f)), Array("only")) ==
      Seq(("only", 0.0, 0.0)))
    // three points on a line: layout distances approximate the input
    // metric after relaxation, and the run is deterministic
    val vecs = Array(Array(0f, 0f), Array(1f, 0f), Array(2f, 0f))
    val ids = Array("a", "b", "c")
    val out = CodeSearch.projectLayout(vecs, ids)
    val out2 = CodeSearch.projectLayout(vecs, ids)
    assert(out == out2)
    def dist(p: (String, Double, Double), q: (String, Double, Double)) =
      math.hypot(p._2 - q._2, p._3 - q._3)
    val m = out.map(p => p._1 -> p).toMap
    // a-b and b-c target distance 1, a-c target 2 — stress relaxation
    // should land within 10%
    assert(math.abs(dist(m("a"), m("b")) - 1.0) < 0.1)
    assert(math.abs(dist(m("b"), m("c")) - 1.0) < 0.1)
    assert(math.abs(dist(m("a"), m("c")) - 2.0) < 0.2)
    // the 10k driver bound is enforced, not silent
    intercept[IllegalArgumentException] {
      CodeSearch.projectLayout(Array.ofDim[Float](10001, 1).map(_ => Array(0f)),
        Array.fill(10001)("x"))
    }
  }

  test("metadataDiff classifies added/removed/modified distributively") {
    val oldSnap = Seq(("a", """{"v":1}"""), ("b", """{"v":2}"""),
      ("c", null: String)).toDF("id", "metadata")
    val newSnap = Seq(("b", """{"v":2}"""), ("c", """{"v":9}"""),
      ("d", """{"v":4}""")).toDF("id", "metadata")
    val diff = CodeSearch.metadataDiff(oldSnap, newSnap)
    val by = diff.collect().map(r => r.getAs[String]("id") ->
      r.getAs[String]("change")).toMap
    assert(by == Map("a" -> "removed", "c" -> "modified", "d" -> "added"))
    val s = CodeSearch.diffSummary(diff).head()
    assert(s.getLong(0) == 1 && s.getLong(1) == 1 && s.getLong(2) == 1)
    val plan = diff.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), plan)
  }

  test("query builder withers, validation, and SearchRequest projection") {
    val qb = IdeQueryBuilder("find the parser").withK(5)
      .withLanguage("scala").withFileFilter("src/**")
    assert(qb.validate().isRight)
    assert(qb.toSearchRequest == SearchRequest("find the parser", 5,
      Some("src/**"), Some("scala")))
    assert(IdeQueryBuilder("").validate() ==
      Left("Query text is required"))
    assert(IdeQueryBuilder("x").withK(0).validate() ==
      Left("k must be at least 1"))
  }

  test("packageJson renders the manifest structure") {
    val json = CodeSearch.packageJson()
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json)
    assert(node.get("name").asText() == "graft-search")
    assert(node.get("contributes").get("commands").size() == 3)
    assert(node.get("contributes").get("configuration").get("properties")
      .has("graft.dimensions"))
  }
}
