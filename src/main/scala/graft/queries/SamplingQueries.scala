package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.{Contamination, Dedup, Repetition, Sampling}

/** Training-data pipeline: deterministic sampling / splitting / shuffling /
  * packing, repetition quality signals, and benchmark-contamination checks.
  * All hash keys are md5 hex prefixes, so every query has an exact DuckDB
  * oracle (hex strings compare identically in any ANSI engine).
  */
object SamplingQueries {

  /** DuckDB replica of Repetition.words. */
  private val duckWords =
    """list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |            x -> len(x) > 0)""".stripMargin

  val defs: Map[String, Q] = Map(
    // Deterministic 80/10/10 train/val/test split on md5(doc_id) buckets;
    // the gate checks the per-split counts AND per-split lang mix (a split
    // keyed on a biased column would skew it). Both threshold buckets are
    // PLANTED (r17 mutation-audit finding: with 500 docs over 256 buckets
    // neither boundary bucket was populated, so a `<`→`<=` threshold
    // mutation stayed green): md5('1000133') starts 'cc' (the train/val
    // edge, floor(256·0.8) = 0xcc) and md5('1000020') starts 'e6' (the
    // val/test edge, floor(256·0.9) = 0xe6).
    "split_assign" -> Q(
      """WITH docs AS (
        |  SELECT doc_id, lang FROM documents
        |  UNION ALL SELECT 1000133, 'zz'
        |  UNION ALL SELECT 1000020, 'zz')
        |SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |            ELSE 'test' END AS split,
        |       lang, count(*) AS n
        |FROM docs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "documents").select(col("doc_id"), col("lang"))
        .unionAll(s.range(1).select(lit(1000133L).as("doc_id"),
          lit("zz").as("lang")))
        .unionAll(s.range(1).select(lit(1000020L).as("doc_id"),
          lit("zz").as("lang")))
        .select(Sampling.splitLabel(col("doc_id"), 0.8, 0.1).as("split"),
          col("lang"))
        .groupBy(col("split"), col("lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("split"), col("lang"))
    },

    // Deterministic ~10% sample: same ids every run, every engine.
    // doc 1015939 (md5 prefix EXACTLY '1999' == threshold(0.1, 4)) is
    // planted AT the exclusive boundary: `prefix < thr` drops it, a `<=`
    // mutation keeps it (r18 audit: the natural corpus had no id at the
    // threshold, leaving the comparison unobservable).
    "sample_hash" -> Q(
      """WITH docs AS (
        |  SELECT doc_id, lang FROM documents
        |  UNION ALL SELECT 1015939, 'zz')
        |SELECT doc_id, lang FROM docs
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Sampling.sampleByHash(
          Tables.load(s, dir, "documents").select(col("doc_id"), col("lang"))
            .unionAll(s.range(1).select(lit(1015939L).as("doc_id"),
              lit("zz").as("lang"))),
          col("doc_id"), 0.1)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },

    // Equal-allocation stratified sample: first 5 docs per language in
    // deterministic hash order.
    "stratified_sample" -> Q(
      """SELECT lang, doc_id FROM documents
        |QUALIFY row_number() OVER (
        |  PARTITION BY lang
        |  ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) <= 5
        |ORDER BY lang, doc_id""".stripMargin
    ) { (s, dir) =>
      Sampling.stratifiedSample(Tables.load(s, dir, "documents"),
          col("lang"), col("doc_id"), perStratum = 5)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    },

    // Reproducible epoch shuffle: the first 20 positions of the seed-42
    // permutation. A different seed gives an independent permutation.
    // Runs through the DISTRIBUTED two-phase rank (shuffleRankScalable,
    // row-identical to the shuffleRank oracle form by spec + 10M smoke);
    // the DuckDB oracle is the single global window.
    "training_shuffle" -> Q(
      """SELECT pos, doc_id FROM (
        |  SELECT row_number() OVER (
        |           ORDER BY md5('epoch42:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos,
        |         doc_id
        |  FROM documents)
        |WHERE pos <= 20 ORDER BY pos""".stripMargin
    ) { (s, dir) =>
      Sampling.shuffleRankScalable(Tables.load(s, dir, "documents"),
          "doc_id", seed = "epoch42")
        .select(col("pos"), col("doc_id"))
        .filter(col("pos") <= 20)
        .orderBy(col("pos"))
    },

    // Sequence packing into 512-token windows over doc_id order: per-window
    // doc count and token total. Runs through the DISTRIBUTED two-phase
    // prefix-sum (packSequentialScalable); the oracle is the single global
    // running sum — they must agree exactly.
    "pack_sequential" -> Q(
      """WITH t AS (
        |  SELECT doc_id, len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                                 x -> len(x) > 0)) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tok,
        |         coalesce(sum(n_tok) OVER (
        |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM t)
        |SELECT CAST(floor(before / 512) AS BIGINT) AS window_id,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(Repetition.words(col("text"))).as("n_tok"))
      Sampling.packSequentialScalable(d, "doc_id", col("n_tok"), budget = 512)
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy(col("window_id"))
    },

    // Gopher-style repetition signals: duplicate-word fraction and
    // top-bigram coverage per document.
    "repetition_signals" -> Q(
      s"""WITH w AS (
         |  SELECT doc_id, $duckWords AS ws FROM documents WHERE doc_id < 100),
         |base AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 2),
         |bg AS (
         |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
         |  FROM base, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
         |cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
         |top AS (SELECT doc_id, round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac
         |        FROM cnt GROUP BY 1)
         |SELECT base.doc_id AS id, CAST(len(ws) AS BIGINT) AS n_words,
         |       round(1.0 - len(list_distinct(ws))::DOUBLE / len(ws), 6) AS dup_word_frac,
         |       top.top_bigram_frac
         |FROM base JOIN top ON base.doc_id = top.doc_id
         |ORDER BY id""".stripMargin
    ) { (s, dir) =>
      Repetition.signals(
          Tables.load(s, dir, "documents").filter(col("doc_id") < 100),
          col("doc_id"), col("text"))
        .orderBy(col("id"))
    },

    // Benchmark contamination: docs sharing a verbatim 8-gram with the
    // held-out set (doc_id % 10 = 0 stands in as the benchmark). The
    // benchmark gram set is broadcast; the corpus side is a map-side join.
    "contamination_ngram" -> Q(
      s"""WITH w AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |g AS (
         |  SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS gram
         |  FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
         |  WHERE len(ws) >= 8),
         |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
         |hits AS (SELECT DISTINCT g.doc_id, g.gram
         |         FROM g JOIN bench USING (gram) WHERE g.doc_id % 10 <> 0)
         |SELECT doc_id, count(*) AS n_shared FROM hits
         |GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      // the benchmark gram set is derived index state (like the BM25 stats
      // tables): build + persist once per eval set, reuse across scans
      val bg = graft.core.IndexCache.getOrBuild(s"contam:$dir:8") {
        Contamination.benchmarkGrams(
          docs.filter(col("doc_id") % 10 === 0), col("text"), n = 8).persist()
      }
      Contamination.flagAgainst(
          docs.filter(col("doc_id") % 10 =!= 0), col("doc_id"), col("text"),
          bg, n = 8)
        .orderBy(col("doc_id"))
    },

    // Fuzzy decontamination: MinHash-estimated Jaccard of corpus docs vs
    // a planted benchmark set (20 verbatim copies at bench_id = doc_id +
    // 10000) — the near-duplicate leakage form that verbatim n-gram
    // overlap misses. CROSS-SET banding (corpus × bench), 64 perms, 16
    // bands × 4; the oracle replays signatures for both sides through
    // the XxHash64Sql machinery and joins raw signature slices (the
    // engine's band-bucket join hashes those same slices).
    "contamination_fuzzy" -> Q(
      s"""WITH allrows AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 20),
        |toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
        |                     x -> length(x) > 0) AS tk
        |  FROM allrows),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |         ELSE list_transform(range(0, len(tk) - 2),
        |                i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]) END)) AS s
        |  FROM toks),
        |hx AS ${XxHash64Sql.wrap("SELECT doc_id, s FROM sh", "s")},
        |hs AS (SELECT doc_id, list(__xxh) AS hl FROM hx GROUP BY doc_id),
        |sigs AS (
        |  SELECT doc_id,
        |         list_transform(${XxHash64Sql.minhashParamsSql(64, 42L)},
        |           pr -> list_min(list_transform(hl,
        |             x -> ((x % 2147483647 + 2147483647) % 2147483647 * pr[1] + pr[2]) % 2147483647))) AS sig
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, bb, sig[4*bb+1] AS s1, sig[4*bb+2] AS s2,
        |         sig[4*bb+3] AS s3, sig[4*bb+4] AS s4
        |  FROM sigs, range(16) r(bb)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS bench_id
        |  FROM bands a JOIN bands b
        |    ON a.bb = b.bb AND a.s1 = b.s1 AND a.s2 = b.s2
        |   AND a.s3 = b.s3 AND a.s4 = b.s4
        |   AND a.doc_id < 10000 AND b.doc_id >= 10000),
        |est AS (
        |  SELECT cand.doc_id AS doc_id, cand.bench_id AS bench_id,
        |         len(list_filter(range(0, 64), i -> sa.sig[i+1] = sb.sig[i+1])) / 64.0 AS ej
        |  FROM cand JOIN sigs sa ON sa.doc_id = cand.doc_id
        |            JOIN sigs sb ON sb.doc_id = cand.bench_id)
        |SELECT doc_id, bench_id, round(ej, 6) AS est_jaccard
        |FROM est WHERE ej >= 0.5 ORDER BY doc_id, bench_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      Contamination.flagFuzzy(
          docs, col("doc_id"), col("text"),
          docs.filter(col("doc_id") < 20)
            .select((col("doc_id") + 10000).as("bid"), col("text")),
          col("bid"), col("text"),
          n = 3, k = 64, bands = 16, threshold = 0.5)
        .orderBy(col("doc_id"), col("bench_id"))
    },

    // Corpus mix report: the per-(source, lang) data-mixing ledger —
    // docs, tokens, token share, mean quality — that a training run's
    // sampling weights are planned against.
    "corpus_mix_report" -> Q(
      s"""WITH t AS (
         |  SELECT source, lang,
         |         len($duckWords) AS n_tok,
         |         round((least(length(text) / 500.0, 1.0)
         |            + (CASE WHEN list_sum(list_transform(string_split_regex(trim(text), '\\s+'), x -> length(x)))
         |                         / len(string_split_regex(trim(text), '\\s+')) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
         |            + (CASE WHEN len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                                         x -> x IN (${graft.text.Tokenizer.defaultStopWords.toSeq.sorted.map(w => s"'$w'").mkString(", ")})))
         |                         / len(string_split_regex(lower(trim(text)), '\\s+')) BETWEEN 0.05 AND 0.6 THEN 1.0 ELSE 0.5 END)
         |            + (1.0 - least((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
         |                           / length(text) * 2.0, 1.0))) / 4.0, 6) AS q
         |  FROM documents),
         |per AS (
         |  SELECT source, lang, count(*) AS n_docs,
         |         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |         round(avg(q), 6) AS mean_quality
         |  FROM t GROUP BY source, lang),
         |tot AS (SELECT sum(n_tokens) AS total FROM per)
         |SELECT source, lang, n_docs, n_tokens, mean_quality,
         |       round(n_tokens / tot.total, 6) AS token_share
         |FROM per, tot ORDER BY source, lang""".stripMargin
    ) { (s, dir) =>
      Sampling.mixReport(
          Tables.load(s, dir, "documents"),
          Seq(col("source"), col("lang")),
          size(Repetition.words(col("text"))),
          graft.pipeline.TextAnalysis.qualityScore(col("text")))
        .orderBy(col("source"), col("lang"))
    },

    // Mixture sampling: target token shares {src0: .5, src1: .3, src2: .2}
    // over a 2000-token budget → per-stratum hash thresholds derived
    // relationally from the corpus (share·budget / stratum-tokens), so
    // both engines compute identical sample membership.
    "mixture_sample" -> Q(
      s"""WITH t AS (
         |  SELECT doc_id, source, len($duckWords) AS n_tok
         |  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
         |per AS (SELECT source, sum(n_tok) AS tok FROM t GROUP BY source),
         |sh AS (SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)) AS s(source, share)),
         |thr AS (
         |  SELECT per.source,
         |         CASE WHEN sh.share * 2000 / per.tok >= 1 THEN 'zzzz'
         |              ELSE lpad(lower(to_hex(CAST(floor(sh.share * 2000 / per.tok * 65536) AS BIGINT))), 4, '0') END AS h
         |  FROM per JOIN sh USING (source))
         |SELECT t.source, count(*) AS n_docs, CAST(sum(t.n_tok) AS BIGINT) AS n_tokens
         |FROM t JOIN thr USING (source)
         |WHERE substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 4) < thr.h
         |GROUP BY t.source ORDER BY t.source""".stripMargin
    ) { (s, dir) =>
      val sampled = Sampling.mixtureSample(
        Tables.load(s, dir, "documents"),
        col("source"), col("doc_id"),
        size(Repetition.words(col("text"))),
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2),
        budgetTokens = 2000L)
      sampled.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(Repetition.words(col("text"))).cast("long")).as("n_tokens"))
        .orderBy(col("source"))
    },

    // Duplicate-group resolution (experimental/dedup.rs): near-dup PAIRS
    // from the n-gram candidate generator run through exact distributed
    // connected components (min-label + pointer jumping), then group
    // stats. Planted triples {i, i+10000, i+20000} (i<10) and pairs
    // {i, i+10000} (10≤i<20) must each collapse to ONE group; the oracle
    // derives the same groups relationally from the content fingerprint.
    "dedup_groups" -> Q(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 40
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20
        |  UNION ALL
        |  SELECT doc_id + 20000, text FROM documents WHERE doc_id < 10)
        |SELECT min(doc_id) AS canonical,
        |       array_to_string(list_sort(list(doc_id)), ',') AS members,
        |       count(*) AS n_members,
        |       CAST(1.0 AS DOUBLE) AS avg_similarity
        |FROM corpus
        |GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |HAVING count(*) > 1
        |ORDER BY canonical""".stripMargin
    ) { (s, dir) =>
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.filter(col("doc_id") < 40)
        .unionAll(d.filter(col("doc_id") < 20)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
        .unionAll(d.filter(col("doc_id") < 10)
          .select((col("doc_id") + 20000).as("doc_id"), col("text")))
      val pairs = Dedup.ngramJaccard(corpus, col("doc_id"), col("text"),
        n = 3, threshold = 0.9, maxShingleFreq = 50)
      graft.pipeline.DedupGroups.groups(pairs, col("jaccard"))
        .select(col("canonical"), concat_ws(",", col("members")).as("members"),
          col("n_members"), round(col("avg_similarity"), 6).as("avg_similarity"))
        .orderBy(col("canonical"))
    },

    // END-TO-END training-data preparation: exact dedup (first occurrence
    // wins, planted +10000 copies removed) → drop the held-out benchmark
    // docs and everything sharing an 8-gram with them → repetition-quality
    // filter (dup-word fraction ≤ 0.3) → deterministic train split →
    // distributed sequence packing. The whole flow composes as lazy plans
    // through the library operators, and the DuckDB oracle replays every
    // stage — the point is that the stages COMPOSE, not just pass alone.
    "pipeline_train_prep" -> Q(
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20),
         |w AS (SELECT doc_id, text, $duckWords AS ws FROM corpus),
         |dd AS (
         |  SELECT doc_id, text, ws FROM (
         |    SELECT doc_id, text, ws, row_number() OVER (
         |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         |      ORDER BY doc_id) AS rn
         |    FROM w) WHERE rn = 1),
         |g AS (
         |  SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS gram
         |  FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(i)
         |  WHERE len(ws) >= 8),
         |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
         |contaminated AS (
         |  SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
         |  WHERE g.doc_id % 10 <> 0),
         |clean AS (
         |  SELECT doc_id, ws FROM dd
         |  WHERE doc_id % 10 <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |quality AS (
         |  SELECT doc_id, ws FROM clean
         |  WHERE len(ws) >= 2
         |    AND 1.0 - len(list_distinct(ws))::DOUBLE / len(ws) <= 0.3),
         |train AS (
         |  SELECT doc_id, len(ws) AS n_tok FROM quality
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'),
         |c AS (
         |  SELECT doc_id, n_tok,
         |         coalesce(sum(n_tok) OVER (
         |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |  FROM train)
         |SELECT CAST(floor(before / 512) AS BIGINT) AS window_id,
         |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.unionAll(d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      val deduped = corpus
        .withColumn("__rn", row_number().over(
          Window.partitionBy(graft.pipeline.TextAnalysis.fingerprintMd5(col("text")))
            .orderBy(col("doc_id"))))
        .filter(col("__rn") === 1).drop("__rn")
      val cleaned = Contamination.clean(
        deduped.filter(col("doc_id") % 10 =!= 0), col("doc_id"), col("text"),
        corpus.filter(col("doc_id") % 10 === 0), col("text"), n = 8)
      val quality = cleaned
        .filter(size(Repetition.words(col("text"))) >= 2)
        .filter(Repetition.dupWordFraction(col("text")) <= 0.3)
      val train = quality
        .filter(Sampling.splitLabel(col("doc_id"), 0.8, 0.1) === "train")
        .select(col("doc_id"), size(Repetition.words(col("text"))).as("n_tok"))
      Sampling.packSequentialScalable(train, "doc_id", col("n_tok"), budget = 512)
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy(col("window_id"))
    },
  )
}
