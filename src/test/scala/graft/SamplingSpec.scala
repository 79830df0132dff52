package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Contamination, Repetition, Sampling}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = sf("documents")

  test("splitLabel: disjoint, exhaustive, deterministic, ~80/10/10") {
    val labeled = docs.select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"), 0.8, 0.1).as("split"))
    val counts = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(n == docs.count())
    assert(counts("train") > n * 6 / 10, s"train too small: $counts")
    // same assignment on a second evaluation (no rand())
    val again = docs.select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"), 0.8, 0.1).as("split"))
    assert(labeled.except(again).count() == 0)
  }

  test("splitLabel is stable under corpus growth (membership by id only)") {
    val subset = docs.filter(col("doc_id") < 50)
    val fromSubset = subset.select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"), 0.8, 0.1).as("split"))
    val fromFull = docs.select(col("doc_id"),
        Sampling.splitLabel(col("doc_id"), 0.8, 0.1).as("split"))
      .filter(col("doc_id") < 50)
    assert(fromSubset.except(fromFull).count() == 0)
  }

  test("sampleByHash: deterministic and near the requested fraction") {
    val s1 = Sampling.sampleByHash(docs, col("doc_id"), 0.2)
    val s2 = Sampling.sampleByHash(docs, col("doc_id"), 0.2)
    assert(s1.select("doc_id").except(s2.select("doc_id")).count() == 0)
    val frac = s1.count().toDouble / docs.count()
    assert(frac > 0.05 && frac < 0.4, s"fraction off: $frac")
    // nested property: a 10% sample is a subset of the 20% sample
    val s3 = Sampling.sampleByHash(docs, col("doc_id"), 0.1)
    assert(s3.select("doc_id").except(s1.select("doc_id")).count() == 0)
  }

  test("stratifiedSample: exactly min(perStratum, |stratum|) rows each") {
    val sampled = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"), 3)
    val perLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(perLang(lang) == math.min(3L, n), s"$lang: ${perLang.get(lang)}")
    }
  }

  test("shuffleRank: a permutation; different seeds differ") {
    val a = Sampling.shuffleRank(docs, col("doc_id"), "s1")
    assert(a.select("pos").distinct().count() == docs.count())
    assert(a.agg(max("pos")).as[Long].head() == docs.count())
    val b = Sampling.shuffleRank(docs, col("doc_id"), "s2")
    val samePos = a.select(col("doc_id"), col("pos"))
      .join(b.select(col("doc_id"), col("pos")), Seq("doc_id", "pos"))
      .count()
    assert(samePos < docs.count() / 2, s"seeds should decorrelate: $samePos")
  }

  test("packSequentialScalable matches the global-window oracle exactly") {
    // 10k rows with varied token counts so windows straddle partitions
    val big = spark.range(10000).select(col("id"),
      (pmod(col("id") * 2654435761L, lit(97)) + 1).cast("int").as("n_tok"))
    val oracle = Sampling.packSequential(big, col("id"), col("n_tok"), 256)
      .select(col("id"), col("window_id"))
    val scalable = Sampling
      .packSequentialScalable(big, "id", col("n_tok"), 256, numPartitions = 7)
      .select(col("id"), col("window_id"))
    assert(oracle.except(scalable).count() == 0)
    assert(scalable.except(oracle).count() == 0)
    // windows hold ≈budget tokens: every full window's total is within
    // budget + max_doc_tokens (a doc can straddle the boundary)
    val totals = Sampling.packSequential(big, col("id"), col("n_tok"), 256)
      .groupBy("window_id").agg(sum("n_tok").as("t"))
      .agg(max("t")).as[Long].head()
    assert(totals <= 256 + 97, s"window overflow: $totals")
  }

  test("mixtureSample: budget-scaled fractions, full-keep cap, strata out " +
       "of the target map excluded") {
    import graft.pipeline.Repetition
    val docs01 = sf("documents")
    val toks = size(Repetition.words(col("text")))
    // huge budget -> every requested stratum's fraction caps at 1 (zzzz)
    val all = Sampling.mixtureSample(docs01, col("source"), col("doc_id"),
      toks, Map("src0" -> 0.5, "src1" -> 0.5), budgetTokens = 10000000L)
    val bySource = all.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs01.filter(col("source").isin("src0", "src1"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource == full, s"cap at 1 keeps everything: $bySource vs $full")
    // small budget -> strict subset, only requested strata, deterministic
    val small = Sampling.mixtureSample(docs01, col("source"), col("doc_id"),
      toks, Map("src0" -> 1.0), budgetTokens = 50L)
    assert(small.select("source").distinct().collect()
      .map(_.getString(0)).toSet == Set("src0"))
    assert(small.count() < full("src0"))
    val again = Sampling.mixtureSample(docs01, col("source"), col("doc_id"),
      toks, Map("src0" -> 1.0), budgetTokens = 50L)
    assert(small.select("doc_id").except(again.select("doc_id")).count() == 0)
  }

  test("repetition signals: planted repetitive doc scores high") {
    val planted = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "a perfectly normal sentence with distinct words only"),
      (3L, "x")).toDF("doc_id", "text")
    val out = Repetition.signals(planted, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L)._1 > 0.8) // 5 of 6 words are repeats
    assert(out(1L)._2 == 1.0) // single bigram covers everything
    assert(out(2L)._1 == 0.0)
    assert(!out.contains(3L)) // <2 words filtered
  }

  test("contamination: verbatim 8-gram overlap flagged, clean() drops it") {
    val benchText = "the quick brown fox jumps over the lazy dog tonight"
    val corpus = Seq(
      (1L, s"prefix words then $benchText and a suffix"),
      (2L, "completely unrelated content with no overlap whatsoever here"),
      (3L, "short doc")).toDF("doc_id", "text")
    val bench = Seq(Tuple1(benchText)).toDF("text")
    val flagged = Contamination.flag(corpus, col("doc_id"), col("text"),
      bench, col("text"), n = 8)
    val ids = flagged.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
    val cleaned = Contamination.clean(corpus, col("doc_id"), col("text"),
      bench, col("text"), n = 8)
    assert(cleaned.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("contamination plan: benchmark side is broadcast") {
    val docs01 = sf("documents")
    val plan = Contamination.flag(
      docs01.filter(col("doc_id") % 10 =!= 0), col("doc_id"), col("text"),
      docs01.filter(col("doc_id") % 10 === 0), col("text"), n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("fuzzy decontamination flags near-duplicates, not verbatim-only") {
    // corpus doc 1 is a one-word edit of the benchmark doc (high Jaccard,
    // zero shared 8-grams after the edit point density) — the case the
    // verbatim flag misses; doc 2 is unrelated
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about solar panels and power generation"),
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
    ).toDF("bid", "text")
    val got = Contamination.flagFuzzy(corpus, col("doc_id"), col("text"),
        bench, col("bid"), col("text"), n = 3, k = 64, bands = 16,
        threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet == Set(1L), s"got ${got.toSeq}")
    assert(got.head._2 == 100L && got.head._3 > 0.5)
    // the cross-set band join must broadcast the benchmark side
    val plan = Contamination.flagFuzzy(corpus, col("doc_id"), col("text"),
        bench, col("bid"), col("text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
