package graft
import org.apache.spark.sql.SparkSession

/** Benchmark surface: one JSON line with per-query wall times.
  *
  * Methodology (stability over raw speed-of-measurement): queries run in
  * deterministic (sorted) order, each timed over `runs` consecutive
  * executions — the first execution absorbs plan compilation/JIT/IO
  * warm-up, so a single-shot suite manufactures phantom regressions that
  * depend on run order (plan-identical queries were measured 9× apart).
  * Three estimators are reported per query: the final JSON line's
  * `queries` map = MEDIAN (2-decimal); per-query `#detail` lines carry
  * full-precision median/min/spread, where spread = (max − min)/median. On sub-second queries the
  * median still carries ±0.1-0.3 s of ambient jitter (GC, page cache,
  * shared host); the MIN is the standard noise-robust floor estimator —
  * noise only ever ADDS time — so round-over-round comparisons should
  * diff `min`, while `spread` makes noisy measurements visible instead of
  * silently trusted.
  *
  * Measured noise floor on this sandbox (two clean back-to-back suite
  * runs, nothing else on the host): suite totals can differ ~1.5× between
  * MINUTES from host-level variance alone — multiplicative, hitting every
  * query in a run, invisible to within-run spread. Treat per-query deltas
  * as signal only when they exceed the run's total-level ratio, or
  * normalize by the suite total before comparing.
  */
object Bench {

  /** One host-load sample: (1-min loadavg, runnable-entity count from
    * /proc/loadavg's 4th field). Two driver rounds in a row (r15 1.09×,
    * r16 2.04×) produced bench artifacts that were host contamination —
    * adjudicated after the fact by re-running on a quiet host. Recording
    * load WITH the measurement lets the artifact self-adjudicate:
    * `load_start` is sampled before the SparkSession exists, so anything
    * substantial there is foreign work (the 1-min EMA decays slowly —
    * a suite that just finished still shows); `load_max`/`runnable_max`
    * across per-query samples catch work arriving mid-run. The bench's
    * own contribution is bounded by its `cpus` thread budget, so
    * tools/bench_diff.py flags a run as SUSPECT when these exceed
    * cpus + a host-size margin.
    */
  private def hostLoad(): (Double, Int) = {
    try {
      val line = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      val f = line.split("\\s+")
      (f(0).toDouble, f(3).split("/")(0).toInt)
    } catch {
      case _: Throwable =>
        val mx = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        (mx.getSystemLoadAverage, -1)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val (loadStart, runnableStart) = hostLoad()
    var loadMax = loadStart
    var runnableMax = runnableStart
    // 3 runs: the first absorbs warm-up, the median of 3 is stable, and
    // 100 queries x 5 runs was brushing against the driver's time budget
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // avoid RPC-backed executor class loading (see build.sbt javaOptions)
      .config("spark.sql.artifact.isolation.enabled", "false")
      // bounded-buffer aggregates (TopKAgg) keep k·16 bytes per group —
      // the 128-group default silently degrades them to sort-based
      // aggregation (sorts EVERY scored row, the cost the aggregate
      // exists to avoid). 64k groups/task ≈ 10 MB at k=10: safe.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/IO paths once so the first measured query
    // does not absorb session initialization (standard bench practice).
    spark.range(1000000).selectExpr("sum(id)").collect()
    try graft.core.Tables.load(spark, sfDir, "nation").count()
    catch { case _: Throwable => () }
    // optional args: bench only the named queries (local iteration)
    val only = args.toSet
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          // collect, not count: count() lets Catalyst prune the projections a
          // query exists to compute (result sets are bounded, so collect is safe)
          try { fn(spark, sfDir).collect().length }
          catch { case _: Throwable => -1 }
          (System.nanoTime() - t0) / 1e9
        }
        val med = median(times)
        val spread = if (med > 0) (times.max - times.min) / med else 0.0
        // per-query load sample: catches contamination arriving mid-run
        val (l, r) = hostLoad()
        loadMax = math.max(loadMax, l); runnableMax = math.max(runnableMax, r)
        (name, med, times.min, spread)
      }
    // The driver keeps only the LAST ~2000 characters of stdout and parses
    // the JSON line from that window. Full-precision maps for 80+ queries
    // overflow it (rounds 1-3 all recorded parsed:null), so the detail
    // (median/min/spread per query, full precision) goes on earlier
    // `#detail` lines and the FINAL line is a compact (<1.8 KB) JSON with
    // 2-decimal medians that fits the window even with sbt's trailing
    // "[success]" line.
    def short(v: Double, dec: Int): String = {
      val s = String.format(s"%.${dec}f", Double.box(v))
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
    }
    results.foreach { case (k, med, mn, sp) =>
      println(f"""#detail {"q":"$k","median":$med%.4f,"min":$mn%.4f,"spread":$sp%.3f}""")
    }
    val total = results.map(_._2).sum
    // Full-precision details also land in a file (the driver's stdout
    // window only keeps the last ~2000 chars, so the #detail stream is
    // lost there): bench_history/ archives one file per round for
    // tools/bench_diff.py to audit regressions mechanically.
    val detailOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "target/bench_detail.json")
    // The three recall floors (ivf_recall, ivf_recall_clustered,
    // quantized_recall) are inherently non-oracle — their measured values
    // are the only drift signal, so every bench artifact records them as
    // a `recall` block (diffable round-over-round instead of buried in
    // logs). One extra execution each; their expensive state is already
    // warm in IndexCache from the timed runs.
    // per-query try: one failing recall query must not drop the other
    // measurements from the artifact
    val recallBlock: Option[String] =
      if (only.nonEmpty) None
      else {
        val per = Seq("ivf_recall", "ivf_recall_clustered", "quantized_recall")
          .flatMap { name =>
            SparkEntry.queries.get(name).flatMap { fn =>
              try {
                // JSON-safe emission: escape key strings; map null/NaN/
                // Infinity values to JSON null (NaN is not legal JSON and
                // would break bench_diff.py's parse of the whole artifact)
                val kv = fn(spark, sfDir).collect().map { r =>
                  // full JSON string escape: a control char (\n, \t, …)
                  // in a group-by key would otherwise emit invalid JSON
                  // and break bench_diff.py's parse of the whole artifact
                  val key = String.valueOf(r.get(0)).flatMap {
                    case '"'  => "\\\""
                    case '\\' => "\\\\"
                    case '\n' => "\\n"
                    case '\r' => "\\r"
                    case '\t' => "\\t"
                    case c if c < ' ' => f"\\u${c.toInt}%04x"
                    case c => c.toString
                  }
                  val v = r.get(1) match {
                    case null => "null"
                    case d: java.lang.Double
                      if d.isNaN || d.isInfinite => "null"
                    case f: java.lang.Float
                      if f.isNaN || f.isInfinite => "null"
                    case n: java.lang.Number => n.toString
                    case _ => "null" // non-numeric second column
                  }
                  s""""$key":$v"""
                }.mkString("{", ",", "}")
                Some(s""""$name":$kv""")
              } catch { case _: Throwable => None }
            }
          }
        if (per.isEmpty) None else Some(per.mkString("{", ",", "}"))
      }
    try {
      val f = new java.io.File(detailOut)
      Option(f.getParentFile).foreach(_.mkdirs())
      val w = new java.io.PrintWriter(f, "UTF-8")
      try {
        val qs = results.map { case (k, med, mn, sp) =>
          f""""$k":{"median":$med%.4f,"min":$mn%.4f,"spread":$sp%.3f}"""
        }.mkString(",")
        val recall = recallBlock.map(r => s""","recall":$r""").getOrElse("")
        val host = f""""host":{"cpus_host":${Runtime.getRuntime.availableProcessors},"load_start":$loadStart%.2f,"load_max":$loadMax%.2f,"runnable_start":$runnableStart,"runnable_max":$runnableMax}"""
        w.println(f"""{"total":$total%.2f,"sf":"${new java.io.File(sfDir).getName}","cpus":$cpus,"runs":$runs,$host$recall%s,"queries":{$qs}}""")
      } finally w.close()
    } catch { case _: Throwable => () } // bench output must never fail the run
    val sfName = new java.io.File(sfDir).getName
    // The final line must fit the driver's ~2000-char stdout tail window.
    // The full 99-query map no longer does at any precision, so the line
    // carries a FIXED headline subset (the BASELINE-comparable + scale-
    // critical queries; stable across rounds so per-query deltas stay
    // diffable) while `value`/`n_queries` still cover the whole suite and
    // the #detail lines above carry every query at full precision.
    val headline: Seq[String] = Seq(
      "knn_cosine", "knn_euclidean", "knn_dot", "knn_manhattan",
      "knn_chebyshev", "knn_hamming", "knn_filtered", "batch_knn_cosine",
      "batch_knn_bulk", "batch_knn_filtered", "radius_cosine",
      "radius_filtered", "matryoshka",
      "search_after", "recommend", "bm25_search", "hybrid_rrf",
      "term_overlap_rerank", "mmr_diversify", "maxsim", "maxsim_two_stage",
      "sparse_dot", "sparse_cosine", "multimodal_fusion", "crossmodal_rrf",
      "graph_knn_edges", "graphrag_search", "ivf_knn_full_probe",
      "ivf_knn_pruned", "lsh_ann", "quantized_recall", "dedup_exact",
      "ngram_jaccard", "minhash_lsh_dedup", "simhash_near_dup",
      "embedding_near_dup", "text_stats", "quality_score", "lang_id",
      "chunk_fixed", "q1_agg", "q2_having", "q3_count_distinct",
      "q4_join_topk", "q5_region_revenue", "vec_centroid", "vec_medoid", "vec_cluster",
      "pipeline_full", "upsert_merge", "change_feed", "federated_rrf",
      "bandit_rerank", "trajectory_dtw", "kg_search", "memory_recall",
      "crdt_converge", "split_assign", "pack_sequential",
      "repetition_signals", "contamination_ngram", "query_builder",
      "data_profile", "pipeline_train_prep", "corpus_mix_report",
      "gopher_rules", "span_dedup", "pii_scrub", "c4_rules",
      "quality_classifier", "semantic_dedup", "boilerplate_lines")
    val shown =
      if (only.nonEmpty) results
      else results.filter { case (k, _, _, _) => headline.contains(k) }
    def line(dec: Int): String = {
      val qs = shown.map { case (k, v, _, _) => "\"" + k + "\":" + short(v, dec) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${short(total, 2)},"unit":"sec","n_queries":${results.size},"load_start":${short(loadStart, 1)},"load_max":${short(loadMax, 1)},"queries":$qs,"sf":"$sfName"}"""
    }
    println(Seq(line(2), line(1)).find(_.length <= 1900).getOrElse(line(1)))
    spark.stop()
  }
}
