package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark backing the UdfLedgerSpec adjudications with numbers
  * measured on THIS engine (r15 verdict item 2): for the three
  * highest-traffic query-path sites, times the compiled-UDF formulation
  * against the higher-order-function formulation (per-element lambdas
  * over `aggregate` / `filter` / per-token `rlike`) on replicated sf
  * testdata. Whichever side is NOT in production is the counterfactual,
  * written here once, as the measurement, and nowhere in the production
  * tree.
  *
  * What the r16 numbers established (bench_history/udf_vs_hof_r16.json):
  * String-input UDFs are cheap (no boxing) and win big against per-token
  * regex lambdas (gopher ~7×); numeric-array-input UDFs LOSE to
  * aggregate expressions because `Seq[Float]` deserialization boxes
  * every element (1.6× at 64-dim, ~9× at 384-dim) — which is why
  * DataProfiler.rowStats became an expression in r16. Emits one JSON
  * line: {"site":{"udf_sec":min,"hof_sec":min,"ratio":hof/udf,…},…}.
  * Artifact destination: bench_history/udf_vs_hof_r16.json.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run_main.sh graft.UdfVsHofBench
  */
object UdfVsHofBench {

  private def timeMinSec(runs: Int)(f: => Unit): Double = {
    var best = Double.MaxValue
    var i = 0
    while (i < runs) {
      val t0 = System.nanoTime()
      f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      i += 1
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .appName("udf-vs-hof").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // replicate the small sf tables to ~100k rows so per-row costs
    // dominate over job scheduling; localCheckpoint so generation cost
    // is paid once outside the timed region
    val docs = spark.range(20).crossJoin(
        spark.read.parquet(s"$sfDir/documents.parquet").select("text"))
      .select(col("text")).localCheckpoint()
    val embs = spark.range(50).crossJoin(
        spark.read.parquet(s"$sfDir/embeddings.parquet").select("embedding"))
      .select(col("embedding").cast("array<float>").as("v")).localCheckpoint()
    val nDocs = docs.count()
    val nVecs = embs.count()

    def force(df: DataFrame): Unit = { df.groupBy().sum().collect(); () }

    // ---- site 1: DataProfiler row stats. The production path is the
    // aggregate-expression form (rowStatsCols); the counterfactual here
    // is the compiled-UDF formulation this site ORIGINALLY shipped with.
    // This measurement flipped the adjudication in r16: a Seq[Float] UDF
    // boxes every element at deserialization — slower than interpreted
    // numeric lambdas at 64-dim and ~9× slower at 384-dim.
    val rowStatsCounterfactualUdf = udf((v: Seq[Float]) => {
      if (v == null) (0, 0.0, 0)
      else {
        var ss = 0.0; var nz = 0; var i = 0
        while (i < v.length) {
          val x = v(i).toDouble
          ss += x * x
          if (math.abs(x) < 0.001) nz += 1
          i += 1
        }
        (v.length, math.sqrt(ss), nz)
      }
    })
    def timeRowStats(frame: DataFrame): (Double, Double) = {
      val u = timeMinSec(runs) {
        force(frame.select(rowStatsCounterfactualUdf(col("v")).as("s"))
          .select(col("s._1").as("a"), col("s._2").as("b"), col("s._3").as("c")))
      }
      val h = timeMinSec(runs) {
        val (d, m, z) = graft.ann.DataProfiler.rowStatsCols(col("v"))
        force(frame.select(d.as("a"), m.as("b"), z.as("c")))
      }
      (u, h)
    }
    val (udf1, hof1) = timeRowStats(embs)
    // the same pass at 384-dim (6× replicated elements) — the shape the
    // 100 TB story actually runs at; boxing cost grows with dim faster
    // than interpreted-lambda overhead
    val embs384 = embs.select(flatten(array_repeat(col("v"), 6)).as("v"))
      .localCheckpoint()
    val (udf1b, hof1b) = timeRowStats(embs384)

    // ---- site 2: Tokenizer.tokens (one compiled split+filter pass;
    // stemming off so both sides compute the same function — Porter has
    // no expression form at all) vs built-in split + per-token
    // length/isin lambda over the same stopword set
    val udf2 = timeMinSec(runs) {
      force(docs.select(size(graft.text.Tokenizer.tokens(col("text"),
        stemming = false)).as("a")))
    }
    val hof2 = timeMinSec(runs) {
      force(docs.select(size(filter(
        split(lower(col("text")), "[^\\p{L}\\p{N}]+"),
        t => length(t) > 1 && !t.isInCollection(
          graft.text.Tokenizer.defaultStopWords))).as("a")))
    }

    // ---- site 3: TextAnalysis.gopherCountsUdf via the production
    // gopherFlags path (9 counts + 8 flags, one character-level pass)
    // vs the per-token/per-line lambda formulation of a SUBSET of the
    // same counts (alpha-word rlike, bullet/ellipsis line rules, word
    // lengths, stopword hits) — the UDF side does strictly more work
    val udf3 = timeMinSec(runs) {
      val flags = graft.pipeline.TextAnalysis.gopherFlags(col("text"))
      force(docs.select(flags.map { case (n, c) => c.cast("long").as(n) }: _*))
    }
    val hof3 = timeMinSec(runs) {
      val words = filter(split(trim(col("text")), "\\s+"),
        w => length(w) > 0)
      val lines = split(col("text"), "\n", -1)
      val lowerWords = transform(words, lower(_))
      val stopsArr = array(
        graft.pipeline.TextAnalysis.gopherRequiredStops.map(lit(_)): _*)
      force(docs.select(
        size(words).cast("long").as("n_words"),
        aggregate(words, lit(0L), (a, w) => a + length(w)).as("sum_len"),
        size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
          .as("n_alpha"),
        size(filter(stopsArr, st => array_contains(lowerWords, st)))
          .cast("long").as("n_stops"),
        size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
          .as("n_bullet"),
        size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
          .as("n_ell_line")))
    }

    def row(site: String, u: Double, h: Double, n: Long): String =
      f""""$site":{"udf_sec":$u%.4f,"hof_sec":$h%.4f,"ratio":${h / u}%.1f,"rows":$n}"""
    println("{" + Seq(
      row("row_stats", udf1, hof1, nVecs),
      row("row_stats_384d", udf1b, hof1b, nVecs),
      row("tokenizer", udf2, hof2, nDocs),
      row("gopher_counts", udf3, hof3, nDocs)).mkString(",")
      + s""","runs":$runs,"sf_dir":"$sfDir"}""")
    spark.stop()
  }
}
