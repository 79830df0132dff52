package graft

import scala.collection.mutable

/** Interactive explorer (reference tui.rs views + visual_explorer.rs):
  * scripted end-to-end sessions through `Cli.run("explore", ...)` — the
  * same wire a user drives — asserting each view's output shape.
  */
class ExplorerSpec extends SparkSpec {

  private def runScript(script: String*): (Int, Seq[String]) = {
    val out = mutable.ArrayBuffer.empty[String]
    val code = Cli.run(spark,
      Seq("explore",
        "--collection", "emb=/root/testdata/sf0.001/embeddings.parquet",
        "--collection", "docs=/root/testdata/sf0.001/documents.parquet"),
      out.append(_), () => script.iterator)
    (code, out.toSeq)
  }

  test("dashboard, ls, use, schema, count — the Collections view") {
    val (code, out) = runScript(
      "dashboard", "ls", "use emb", "schema", "count", "quit")
    assert(code == 0)
    assert(out.exists(_.contains("total vectors: 1000")), out.mkString("\n"))
    assert(out.exists(l => l.contains("docs") && !l.startsWith("error")))
    assert(out.exists(_.contains("using emb")))
    assert(out.exists(_.contains("embedding: array<float>")))
    assert(out.contains("500"))
  }

  test("search by id and by literal vector — the Search view") {
    val (code, out) = runScript(
      "use emb", "search 0 3", "quit")
    assert(code == 0)
    // nearest to vec 0 is itself at distance 0
    val hits = out.filter(_.trim.matches("0\\s+0\\.000000"))
    assert(hits.nonEmpty, out.mkString("\n"))
    assert(out.count(_.matches("\\s+\\d+\\s+\\d\\.\\d{6}")) == 3)
  }

  test("head and browse paginate with stable order") {
    val (code, out) = runScript(
      "use docs", "head 3", "browse", "browse next", "quit")
    assert(code == 0)
    assert(out.exists(_.startsWith("doc_id")))
    assert(out.exists(_.contains("page 0")))
    assert(out.exists(_.contains("page 1")))
    // browse page 0 starts at doc_id 0, page 1 at doc_id 10
    val pageStarts = out.filter(_.matches("^\\d+\\t.*"))
      .map(_.split("\t")(0))
    assert(pageStarts.contains("0") && pageStarts.contains("10"))
  }

  test("clusters, anomalies, project — the analysis views") {
    val (code, out) = runScript(
      "use emb", "clusters 3", "anomalies 5", "project 100", "quit")
    assert(code == 0)
    assert(out.count(_.trim.startsWith("cluster ")) == 3)
    assert(out.count(_.contains("lof=")) == 5)
    assert(out.exists(_.contains("PCA projection of 100 points")))
    // the scatter renders 20 grid rows with at least one point
    val gridRows = out.filter(l => l.startsWith("|") && l.endsWith("|"))
    assert(gridRows.size == 20 && gridRows.exists(_.contains("*")))
  }

  test("sql and explain run NeedleQL against registered collections") {
    val (code, out) = runScript(
      "sql SELECT doc_id FROM docs WHERE lang = 'en' ORDER BY doc_id LIMIT 2",
      "explain SELECT doc_id FROM docs LIMIT 1",
      "quit")
    assert(code == 0)
    assert(out.exists(_.startsWith("doc_id")))
    assert(out.exists(l => l.contains("Scan") || l.contains("FileScan")))
  }

  test("errors are recoverable and reported; unknown command flagged") {
    val (code, out) = runScript(
      "use nope", "bogus", "use emb", "count", "quit")
    assert(code == 1) // the bogus command sets a nonzero exit
    assert(out.exists(_.contains("no such collection")))
    assert(out.exists(_.contains("unknown command: bogus")))
    assert(out.contains("500"), "session must keep working after errors")
  }

  test("explore without collections is a usage error") {
    val out = mutable.ArrayBuffer.empty[String]
    val code = Cli.run(spark, Seq("explore"), out.append(_),
      () => Iterator.empty)
    assert(code == 1 && out.exists(_.contains("--collection")))
  }
}
