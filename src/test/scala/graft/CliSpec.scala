package graft

import org.apache.spark.sql.functions._

/** Smoke for the spark-submit CLI (reference README.md:582-608 `needle`
  * binary): each subcommand driven through [[Cli.run]] against the shared
  * test session, output captured via the injected sink.
  */
class CliSpec extends SparkSpec {

  private def cli(args: String*): (Int, Seq[String]) = {
    val lines = Seq.newBuilder[String]
    val code = Cli.run(spark, args, out = lines += _)
    (code, lines.result())
  }

  private lazy val dataDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli").toString
    // 40 unit-ish vectors in 4 dims with ids v00..v39
    spark.range(40).select(
      format_string("v%02d", col("id")).as("id"),
      array(
        cos(col("id") * 0.37).cast("float"),
        sin(col("id") * 0.37).cast("float"),
        cos(col("id") * 0.11 + 1).cast("float"),
        sin(col("id") * 0.11 + 1).cast("float")).as("vector"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/a.parquet")
    // target: drop v00, modify v01, keep the rest
    val a = spark.read.parquet(s"$dir/a.parquet")
    a.filter(col("id") =!= "v00")
      .withColumn("vector", when(col("id") === "v01",
        array(lit(9f), lit(9f), lit(9f), lit(9f))).otherwise(col("vector")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/b.parquet")
    dir
  }

  test("arg parser: repeatable options, =-form, flags, positionals") {
    val p = Cli.parseArgs(Seq("--collection", "a=x", "--collection=b=y",
      "pos1", "--json", "--k", "5", "pos2"))
    assert(p.positional == Seq("pos1", "pos2"))
    assert(p.options("collection") == Vector("a=x", "b=y"))
    assert(p.options("k") == Vector("5"))
    assert(p.options.contains("json"))
  }

  test("arg parser: boolean flags never swallow the next token") {
    // --json before a short option: -e must stay a distinct option
    val p1 = Cli.parseArgs(Seq("sql", "--json", "-e", "SELECT 1"))
    assert(p1.options("json") == Vector(""))
    assert(p1.options("e") == Vector("SELECT 1"))
    // --summary before positionals: SRC/TGT must stay positional
    val p2 = Cli.parseArgs(Seq("diff", "--summary", "src.parquet", "tgt.parquet"))
    assert(p2.positional == Seq("diff", "src.parquet", "tgt.parquet"))
    assert(p2.options("summary") == Vector(""))
    val p3 = Cli.parseArgs(Seq("dedup", "c.parquet", "--groups", "--json"))
    assert(p3.options.contains("groups") && p3.options.contains("json"))
  }

  test("no command / unknown command → usage, exit 1") {
    assert(cli()._1 == 1)
    val (code, out) = cli("frobnicate")
    assert(code == 1 && out.exists(_.contains("usage")))
  }

  test("sql: batch query over a registered parquet collection") {
    val (code, out) = cli("sql",
      "--collection", s"docs=$dataDir/a.parquet",
      "-e", "SELECT id, distance FROM docs NEAREST_TO([1.0, 0.0, 0.5403023, 0.841471], 'cosine', 5) LIMIT 5",
      "--json")
    assert(code == 0, out.mkString("\n"))
    assert(out.length == 5)
    // v00 is the query vector itself → nearest
    assert(out.head.contains("\"v00\""), out.head)
  }

  test("web: serves the dashboard and REST API over a parquet " +
      "collection, exits on EOF") {
    val lines = Seq.newBuilder[String]
    // in() is empty → the server starts, prints both addresses, stops
    val code = Cli.run(spark, Seq("web",
      "--collection", s"docs=$dataDir/a.parquet"),
      out = lines += _, in = () => Iterator.empty)
    assert(code == 0)
    val out = lines.result()
    assert(out.exists(_.startsWith("REST API on http://127.0.0.1:")))
    assert(out.exists(_.startsWith("dashboard on http://127.0.0.1:")))
    assert(out.exists(_.startsWith("GraphQL on http://127.0.0.1:")))
  }

  test("sql: parse errors exit 2; missing query exits 1") {
    val (code, out) = cli("sql",
      "--collection", s"docs=$dataDir/a.parquet", "-e", "SELEC nope")
    assert(code == 2 && out.exists(_.contains("parse error")))
    assert(cli("sql", "--collection", s"docs=$dataDir/a.parquet",
      "-e", "")._1 == 1)
  }

  test("diff: reports removed/modified rows and --summary counts") {
    val (code, out) = cli("diff", s"$dataDir/a.parquet",
      s"$dataDir/b.parquet", "--json")
    assert(code == 0)
    assert(out.exists(l => l.contains("v00") && l.contains("removed")))
    assert(out.exists(l => l.contains("v01") && l.contains("modified")))
    assert(!out.exists(_.contains("unchanged")))
    val (c2, sum) = cli("diff", s"$dataDir/a.parquet", s"$dataDir/b.parquet",
      "--summary")
    assert(c2 == 0)
    val counts = sum.filter(_.contains("\t")).map(_.split("\t"))
      .collect { case Array(s, n) if s != "status" => s -> n }.toMap
    assert(counts("removed") == "1" && counts("modified") == "1" &&
      counts("unchanged") == "38", counts)
  }

  test("merge: source-wins restores removed + modified rows") {
    val outPath = java.nio.file.Files
      .createTempDirectory("graft-cli-merge").toString + "/m.parquet"
    val (code, out) = cli("merge", s"$dataDir/a.parquet",
      s"$dataDir/b.parquet", "--out", outPath, "--strategy", "source-wins")
    assert(code == 0)
    assert(out.exists(_.contains("\"merged\": 40")), out.mkString("\n"))
    val merged = spark.read.parquet(outPath)
    assert(merged.count() == 40)
    val v01 = merged.filter(col("id") === "v01")
      .select(element_at(col("vector"), 1)).head().getFloat(0)
    assert(math.abs(v01 - math.cos(0.37).toFloat) < 1e-6,
      "source vector won for the modified id")
  }

  test("evaluate: full probe reaches recall 1.0") {
    val (code, out) = cli("evaluate", s"$dataDir/a.parquet",
      "--k", "5", "--cells", "4", "--nprobe", "4", "--queries", "3")
    assert(code == 0, out.mkString("\n"))
    val summary = out.last
    assert(summary.contains("\"mean_recall\": 1.0000"), summary)
    assert(summary.contains("\"mean_scan_fraction\": 1.0000"), summary)
  }

  test("dedup: planted near-identical pair reported, --groups resolves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli-dd").toString
    val a = spark.read.parquet(s"$dataDir/a.parquet")
    // clone v05 as d05 with a tiny perturbation → one near-dup pair
    a.unionByName(a.filter(col("id") === "v05").select(lit("d05").as("id"),
        transform(col("vector"), x => x + lit(1e-4f)).as("vector")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/c.parquet")
    val (code, out) = cli("dedup", s"$dir/c.parquet",
      "--max-distance", "0.01", "--cells", "4", "--json")
    assert(code == 0, out.mkString("\n"))
    assert(out.exists(l => l.contains("d05") && l.contains("v05")), out)
    val (gc, gout) = cli("dedup", s"$dir/c.parquet",
      "--max-distance", "0.01", "--cells", "4", "--groups")
    assert(gc == 0)
    assert(gout.exists(_.contains("2")), "one group of two members")
  }

  test("bundle: export then import round-trips rows and config") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli-bd").toString
    val (ec, eout) = cli("export-bundle", s"$dataDir/a.parquet",
      "--out", s"$dir/bundle", "--name", "testcoll")
    assert(ec == 0, eout.mkString("\n"))
    assert(eout.exists(l => l.contains("testcoll") && l.contains(
      "\"dimensions\": 4")))
    val (ic, iout) = cli("import-bundle", s"$dir/bundle",
      "--out", s"$dir/roundtrip.parquet")
    assert(ic == 0, iout.mkString("\n"))
    assert(iout.exists(_.contains("\"count\": 40")), iout)
    assert(spark.read.parquet(s"$dir/roundtrip.parquet").count() == 40)
  }

  test("estimate + recommend-index + health run on a collection") {
    val (ec, eout) = cli("estimate", s"$dataDir/a.parquet", "--k", "5")
    assert(ec == 0, eout.mkString("\n"))
    assert(eout.exists(_.contains("strategy")), eout)
    val (rc, rout) = cli("recommend-index", s"$dataDir/a.parquet")
    assert(rc == 0 && rout.exists(_.contains("\"recommended\"")), rout)
    assert(rout.exists(_.contains("exact")), "40 vectors → exact scan")
    val (hc, hout) = cli("health", s"$dataDir/a.parquet", "--k", "3")
    assert(hc == 0, hout.mkString("\n"))
    assert(hout.exists(l => l.contains("\"rows\": 40") &&
      l.contains("\"null_vectors\": 0")), hout)
  }

  test("index-build then index-search answers from the stored cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli-ix").toString
    val (bc, bout) = cli("index-build", s"$dataDir/a.parquet",
      "--out", s"$dir/ix", "--cells", "4")
    assert(bc == 0, bout.mkString("\n"))
    assert(bout.exists(l => l.contains("\"indexed\": 40") &&
      l.contains("\"cells\": 4")), bout)
    // query by id from the source collection; full probe = exact top-1 is
    // the query row itself at distance 0
    val (sc, sout) = cli("index-search", s"$dir/ix",
      "--query-id", "v07", "--collection", s"$dataDir/a.parquet",
      "--k", "3", "--nprobe", "4", "--json")
    assert(sc == 0, sout.mkString("\n"))
    assert(sout.head.contains("\"id\":\"v07\"") ||
      sout.head.contains("\"id\": \"v07\""), sout.head)
    // literal-vector form agrees
    val qv = spark.read.parquet(s"$dataDir/a.parquet")
      .filter(col("id") === "v07").select("vector")
      .head().getSeq[Float](0)
    val (vc2, vout) = cli("index-search", s"$dir/ix",
      "--vector", qv.mkString(","), "--k", "3", "--nprobe", "4", "--json")
    assert(vc2 == 0 && vout == sout, vout.mkString("\n"))
  }

  test("tune: emits a frontier and a best config meeting the floor") {
    val (code, out) = cli("tune", s"$dataDir/a.parquet",
      "--k", "5", "--queries", "3", "--min-recall", "0.9")
    assert(code == 0, out.mkString("\n"))
    assert(out.count(_.contains("\"scan_fraction\"")) > 1, "frontier printed")
    assert(out.last.contains("\"best\": {"), out.last)
  }
}
