package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.{Dedup, TextAnalysis}
import graft.text.Tokenizer

/** Training-data-pipeline operator queries: text analysis + dedup family.
  * MinHash/SimHash entries are rows-only (hash functions are not
  * reproducible in ANSI SQL); everything else has an exact DuckDB oracle.
  */
object PipelineQueries {

  private val stopList = Tokenizer.defaultStopWords.toSeq.sorted
    .map(w => s"'$w'").mkString(", ")

  /** Pinned linear quality model for the `quality_classifier_fixed` gate:
    * LR over tf counts of a fixed 10-term vocabulary, fitted once against
    * the "document mentions 'table'" seed labeling and frozen here as
    * decimal literals. The SAME strings feed both sides — `.toDouble` for
    * Spark, verbatim interpolation for DuckDB — so both engines parse the
    * identical nearest-double weights.
    */
  private val qcVocab = Seq("table", "data", "query", "join", "hash",
    "spark", "vector", "stream", "filter", "batch")
  private val qcWeights = Seq("6.891273319064015", "0.005441656817936885",
    "0.08515721440525505", "0.07341991330058673", "-0.01925447278271162",
    "0.02071599846346851", "0.05032865350021801", "0.13632578906799991",
    "0.0682286207738857", "-0.002832487272056724")
  private val qcIntercept = "-3.8997167972919713"

  private def qcFixedSql: String = {
    val inList = qcVocab.map(v => s"'$v'").mkString(", ")
    val tfCases = qcVocab.zipWithIndex.map { case (v, i) =>
      s"coalesce(max(CASE WHEN t.term = '$v' THEN t.c END), 0)::DOUBLE AS tf$i"
    }.mkString(",\n        ")
    val dot = qcWeights.zipWithIndex
      .map { case (w, i) => s"$w * tf$i" }.mkString(" + ")
    // no stop-word filter needed: every vocab term is a non-stop token, so
    // its count is identical with or without stop removal upstream
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS c FROM toks
       |       WHERE len(term) > 1 AND term IN ($inList)
       |       GROUP BY doc_id, term),
       |f AS (SELECT d.doc_id,
       |        $tfCases
       |      FROM documents d LEFT JOIN tf t ON d.doc_id = t.doc_id
       |      GROUP BY d.doc_id),
       |z AS (SELECT doc_id, $qcIntercept + $dot AS z FROM f)
       |SELECT doc_id, round(z, 6) AS quality_margin,
       |       CAST(z > 0 AS BIGINT) AS quality_pred,
       |       round(1 / (1 + exp(-z)), 6) AS quality_prob
       |FROM z ORDER BY doc_id""".stripMargin
  }

  /** documents ∪ (docs with id<20 re-inserted under id+10000) — a
    * deterministic corpus with planted exact duplicates, built identically
    * on both sides.
    */
  /** Planted Gopher boundary doc (see `gopher_rules`): exactly 50 words
    * (word-count lo bound), 45 alphabetic (ratio 0.9 ∈ [0.8, 0.95)),
    * exactly 2 of the 8 reference stopwords ("the", "and") — the
    * word-salad corpus holds no row at any of these three boundaries,
    * which left the r17 alpha-threshold mutation unobservable.
    */
  private val gopherBoundaryText =
    "the and pony river stone cloud maple ember quiet forest meadow " +
      "copper winter salmon harbor violet timber faint marble garden " +
      "sunset prairie willow canyon thunder breeze orchard crystal " +
      "lantern pebble shadow spruce falcon harvest juniper cobalt amber " +
      "raven tundra velvet saffron indigo myrtle walnut cedar 11 22 33 44 55"

  private def withPlantedDups(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    d.select(col("doc_id"), col("text"))
      .unionAll(d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
  }

  private val dupUnionSql =
    """(SELECT doc_id, text FROM documents
      | UNION ALL
      | SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 20)""".stripMargin

  /** DuckDB replica of Dedup.shingles (3-gram, lowercased ws tokens). */
  private val duckShingles =
    """CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |     ELSE list_transform(range(1, len(toks) - 1),
      |                         i -> array_to_string(toks[i:i+2], ' ')) END""".stripMargin

  val defs: Map[String, Q] = Map(
    // Token counting + quality signals (per-row narrow expressions).
    "text_stats" -> Q(
      s"""SELECT doc_id,
         |       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         |       round(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                             t -> t IN ($stopList)))
         |             / len(string_split_regex(lower(trim(text)), '\\s+')), 6) AS stop_ratio,
         |       round(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
         |                                     t -> length(t)))
         |             / len(string_split_regex(trim(text), '\\s+')), 6) AS mean_word_len
         |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          TextAnalysis.tokenCountWs(col("text")).as("n_tokens"),
          round(TextAnalysis.stopwordRatio(col("text")), 6).as("stop_ratio"),
          round(TextAnalysis.meanWordLen(col("text")), 6).as("mean_word_len"))
        .orderBy(col("doc_id"))
    },

    // Composite quality score + BPE-ish token estimate.
    "quality_score" -> Q(
      s"""WITH f AS (
         |  SELECT doc_id,
         |         least(length(text) / 500.0, 1.0) AS len_score,
         |         list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
         |                                 t -> length(t)))
         |           / len(string_split_regex(trim(text), '\\s+')) AS wl,
         |         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                         t -> t IN ($stopList)))
         |           / len(string_split_regex(lower(trim(text)), '\\s+')) AS sr,
         |         (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
         |           / length(text) AS pr,
         |         list_sum(list_transform(
         |           regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'),
         |           p -> CASE WHEN regexp_full_match(p, '[A-Za-z]+')
         |                     THEN CAST(ceil(length(p) / 4.0) AS INT) ELSE 1 END)) AS bpe
         |  FROM (SELECT doc_id, text FROM documents WHERE doc_id < 100
         |        UNION ALL SELECT 900100,
         |          'graft quality fixture, with punct; the fox jumps. over!')
         |)
         |SELECT doc_id, CAST(bpe AS BIGINT) AS n_tokens_bpe,
         |       round((len_score
         |            + (CASE WHEN wl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
         |            + (CASE WHEN sr BETWEEN 0.05 AND 0.6 THEN 1.0 ELSE 0.5 END)
         |            + (1.0 - least(pr * 2.0, 1.0))) / 4.0, 6) AS quality
         |FROM f ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      // planted doc 900100: the natural word-salad corpus contains ZERO
      // punctuation (measured: max punct ratio 0.0 over doc_id < 100), so
      // the punct penalty was 1.0 on every row and its 2.0 multiplier was
      // gate-invisible (r19 audit). This row's ratio sits strictly inside
      // (0, 0.5) where the multiplier is live and unsaturated.
      Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
        .unionAll(s.range(1).select(lit(900100L).as("doc_id"),
          lit("graft quality fixture, with punct; the fox jumps. over!")
            .as("text")))
        .select(col("doc_id"),
          // long on both sides: DuckDB list_sum yields HUGEINT, which the
          // driver's pandas bridge turns into float64 — int32 here would
          // then hash-mismatch (42 vs 42.0)
          TextAnalysis.tokenCountBpe(col("text")).cast("long").as("n_tokens_bpe"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    },

    // Stop-word-profile language ID; the fold keeps the alphabetically
    // first language on score ties, which the CASE cascade mirrors.
    "lang_id" -> Q(
      """WITH sc AS (
        |  SELECT doc_id,
        |         len(list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |             t -> t IN ('der','die','und','das','ist','nicht','ein','mit'))) AS s_de,
        |         len(list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |             t -> t IN ('the','and','of','to','is','in','that','it'))) AS s_en,
        |         len(list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |             t -> t IN ('el','la','de','que','y','los','en','un'))) AS s_es,
        |         len(list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
        |             t -> t IN ('le','la','de','et','les','des','un','une'))) AS s_fr,
        |         regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS cjk
        |  FROM documents
        |)
        |SELECT CASE WHEN cjk THEN 'zh'
        |            WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
        |            WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
        |            WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
        |            WHEN s_es >= s_fr THEN 'es'
        |            ELSE 'fr' END AS pred_lang,
        |       count(*) AS n
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(TextAnalysis.languageId(col("text")).as("pred_lang"))
        .groupBy(col("pred_lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("pred_lang"))
    },

    // Fixed-size text chunking (reference pipeline.rs:735-758): 120-char
    // windows stepping 100 (overlap 20), trimmed, empties dropped, chunk
    // indices compact per doc. Sentence/recursive strategies are
    // spec-pinned (ChunkingSpec); fixed-size is the SQL-replayable one.
    "chunk_fixed" -> Q(
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
        |s AS (SELECT doc_id, text,
        |             unnest(range(0, CAST(ceil(length(text) / 100.0) AS BIGINT))) AS i
        |      FROM d),
        |c AS (SELECT doc_id, i, trim(substr(text, CAST(i*100 + 1 AS INT), 120)) AS chunk
        |      FROM s),
        |f AS (SELECT doc_id, chunk,
        |             row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS chunk_index
        |      FROM c WHERE chunk <> '')
        |SELECT doc_id, chunk_index, chunk FROM f
        |ORDER BY doc_id, chunk_index""".stripMargin
    ) { (s, dir) =>
      import graft.pipeline.Chunking
      Chunking.chunk(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 40),
        col("doc_id"), col("text"),
        Chunking.Config(Chunking.Strategy.FixedSize, chunkSize = 120,
          chunkOverlap = 20))
        .orderBy(col("doc_id"), col("chunk_index"))
    },

    // End-to-end ingestion pipeline composition (reference pipeline.rs
    // IngestionPipeline stages): chunk → corpus-wide exact chunk dedup
    // (first occurrence by (doc_id, chunk_index) wins) → token-count
    // quality filter. Every stage is SQL-replayable, so the whole
    // composition is oracle-gated — the point is that the operators
    // COMPOSE as lazy plans, not just work in isolation.
    "pipeline_ingest" -> Q(
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
        |s AS (SELECT doc_id, text,
        |             unnest(range(0, CAST(ceil(length(text) / 100.0) AS BIGINT))) AS i
        |      FROM d),
        |c AS (SELECT doc_id, i, trim(substr(text, CAST(i*100 + 1 AS INT), 120)) AS chunk
        |      FROM s),
        |f AS (SELECT doc_id, chunk,
        |             row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS chunk_index
        |      FROM c WHERE chunk <> ''),
        |dd AS (SELECT doc_id, chunk_index, chunk,
        |              row_number() OVER (
        |                PARTITION BY md5(regexp_replace(lower(trim(chunk)), '\s+', ' ', 'g'))
        |                ORDER BY doc_id, chunk_index) AS rn
        |       FROM f)
        |SELECT doc_id, chunk_index, chunk FROM dd
        |WHERE rn = 1 AND len(string_split_regex(trim(chunk), '\s+')) >= 10
        |ORDER BY doc_id, chunk_index""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.pipeline.Chunking
      val chunks = Chunking.chunk(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 60),
        col("doc_id"), col("text"),
        Chunking.Config(Chunking.Strategy.FixedSize, chunkSize = 120,
          chunkOverlap = 20))
      chunks
        .withColumn("__rn", row_number().over(
          Window.partitionBy(TextAnalysis.fingerprintMd5(col("chunk")))
            .orderBy(col("doc_id"), col("chunk_index"))))
        .filter(col("__rn") === 1).drop("__rn")
        .filter(TextAnalysis.tokenCountWs(col("chunk")) >= 10)
        .orderBy(col("doc_id"), col("chunk_index"))
    },

    // Exact dedup over a corpus with planted duplicates.
    "dedup_exact" -> Q(
      s"""SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |       count(*) AS n_copies,
         |       min(doc_id) AS keeper,
         |       array_to_string(list_sort(list(doc_id)), ',') AS ids
         |FROM $dupUnionSql
         |GROUP BY 1 HAVING count(*) > 1
         |ORDER BY keeper""".stripMargin
    ) { (s, dir) =>
      Dedup.exact(withPlantedDups(s, dir), col("doc_id"), col("text"))
        // comma-join the id list: the driver's row comparer can't sort
        // array-typed cells, and the string form hashes identically
        .withColumn("ids", concat_ws(",", col("ids")))
        .orderBy(col("keeper"))
    },

    // N-gram Jaccard near-dup pairs via the scale path (rare-shingle
    // candidate generation, maxShingleFreq=50). The natural sf* corpora
    // have max pair-jaccard ≈ 0.02, so near-dups are PLANTED identically
    // on both sides: exact copies (+10000, jaccard 1.0) and copies with
    // three marker tokens appended (+20000, jaccard m/(m+3) ≈ 0.9) — the
    // gate exercises real matches, not an empty result set.
    "ngram_jaccard" -> Q(
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 60
         |  UNION ALL
         |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20
         |  UNION ALL
         |  SELECT doc_id + 20000, text || ' zq1m zq2m zq3m'
         |  FROM documents WHERE doc_id < 20
         |),
         |sh AS (
         |  SELECT doc_id, list_distinct($duckShingles) AS sh
         |  FROM (SELECT doc_id,
         |               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                           t -> len(t) > 0) AS toks
         |        FROM corpus)
         |)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       round(len(list_intersect(a.sh, b.sh))
         |             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh))
         |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
         |ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      val d = Tables.load(s, dir, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
      val corpus = d
        .unionAll(d.filter(col("doc_id") < 20)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
        .unionAll(d.filter(col("doc_id") < 20)
          .select((col("doc_id") + 20000).as("doc_id"),
            concat(col("text"), lit(" zq1m zq2m zq3m")).as("text")))
      Dedup.ngramJaccard(corpus, col("doc_id"), col("text"), n = 3,
        threshold = 0.2, maxShingleFreq = 50)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Embedding-cosine near-duplicate pairs via the IVF-BLOCKED scale path
    // (Ivf.nearDupBlocked — join within cells only). The oracle is the
    // exact all-pairs join: they agree because (a) planted duplicates are
    // bit-identical vectors, which always land in the same cell, and
    // (b) every non-planted pair sits at distance ≥ 0.56 (sf* corpora are
    // near-dup-free), far above the 0.35 threshold on both sides.
    "embedding_near_dup" -> Q(
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
        |  UNION ALL
        |  SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id < 20
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(1 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS distance
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE round(1 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) <= 0.35
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      import graft.ann.Ivf
      val e = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 200)
        .select(col("vec_id"), col("embedding"))
      val corpus = e.unionAll(e.filter(col("vec_id") < 20)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      val ix = Ivf.build(corpus, col("embedding"), numCells = 8, metric = "cosine")
      Ivf.nearDupBlocked(ix, "vec_id", "embedding", maxDistance = 0.35)
        .orderBy(col("id_a"), col("id_b"))
    },

    // MinHash+LSH near-dup — full hash oracle since r5: XxHash64Sql
    // replicates Spark's xxhash64 in DuckDB (HUGEINT mod-2^64 XXH64), the
    // permutation family comes from the SAME Dedup.hashParams constants,
    // and banding candidates join on the raw r-value signature slices
    // (identical pairs to the engine's bucket-hash join, which only
    // re-keys those slices through one more xxhash64).
    "minhash_lsh_dedup" -> Q(
      s"""WITH corpus AS $dupUnionSql,
        |toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
        |                     x -> length(x) > 0) AS tk
        |  FROM corpus),
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
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.bb = b.bb AND a.s1 = b.s1 AND a.s2 = b.s2
        |   AND a.s3 = b.s3 AND a.s4 = b.s4 AND a.doc_id < b.doc_id),
        |est AS (
        |  SELECT id_a, id_b,
        |         len(list_filter(range(0, 64), i -> sa.sig[i+1] = sb.sig[i+1])) / 64.0 AS ej
        |  FROM cand JOIN sigs sa ON sa.doc_id = id_a
        |            JOIN sigs sb ON sb.doc_id = id_b)
        |SELECT id_a, id_b, round(ej, 6) AS est_jaccard
        |FROM est WHERE ej >= 0.5 ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      Dedup.minhashLsh(withPlantedDups(s, dir), col("doc_id"),
          col("text"), n = 3, k = 64, bands = 16, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },

    // SimHash near-dup within Hamming distance 3 — full hash oracle since
    // r5 (same XxHash64Sql base). The oracle ranks ALL pairs by fingerprint
    // Hamming distance, which equals the engine's pigeonhole-chunk join
    // output exactly: any pair within distance 3 shares one of the 4
    // 16-bit chunks by pigeonhole, so the candidate restriction loses
    // nothing.
    "simhash_near_dup" -> Q(
      s"""WITH corpus AS $dupUnionSql,
        |toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
        |                     x -> length(x) > 0) AS tk
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |         ELSE list_transform(range(0, len(tk) - 2),
        |                i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]) END)) AS s
        |  FROM toks),
        |hx AS ${XxHash64Sql.wrap("SELECT doc_id, s FROM sh", "s")},
        |hs AS (SELECT doc_id, list(__xxh) AS hl FROM hx GROUP BY doc_id),
        |fps AS (
        |  SELECT doc_id,
        |    CAST((fpu + 9223372036854775808) % 18446744073709551616
        |         - 9223372036854775808 AS BIGINT) AS fp
        |  FROM (
        |    SELECT doc_id,
        |      list_sum(list_transform(range(0, 64), bb ->
        |        CASE WHEN 2 * len(list_filter(hl, x ->
        |               (((CAST(x AS HUGEINT) + 18446744073709551616) % 18446744073709551616)
        |                // (${XxHash64Sql.pow2Sql})[bb+1]) % 2 = 1))
        |               - len(hl) > 0
        |             THEN (${XxHash64Sql.pow2Sql})[bb+1]
        |             ELSE CAST(0 AS HUGEINT) END)) AS fpu
        |    FROM hs))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        |FROM fps a JOIN fps b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      Dedup.simhashNearDup(withPlantedDups(s, dir), col("doc_id"),
          col("text"), n = 3, maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long")
          .as("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // Incremental SimHash dedup through the STORED-FINGERPRINT seam
    // (Dedup.simhashNearDupFromFps): the base corpus (doc_id < 300) has
    // its fingerprints materialized up front — as a stored fingerprint
    // column would be — and a new batch (planted copies of doc_id < 20
    // under +10000) is fingerprinted and banded against them; reported
    // pairs are those touching the new batch (id_b >= 10000, since new
    // ids exceed all stored ids and pairs are id_a < id_b). The oracle
    // replays fingerprints via XxHash64Sql and brute-forces all pairs —
    // identical by the pigeonhole argument (any pair within hamming 3
    // agrees on one of the 4 16-bit chunks). This puts the seam that the
    // 100M smoke drives (and that incremental-dedup callers use) under
    // the same full-hash driver gate as the one-shot path.
    "simhash_incremental" -> Q(
      s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 20),
        |toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
        |                     x -> length(x) > 0) AS tk
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |         ELSE list_transform(range(0, len(tk) - 2),
        |                i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]) END)) AS s
        |  FROM toks),
        |hx AS ${XxHash64Sql.wrap("SELECT doc_id, s FROM sh", "s")},
        |hs AS (SELECT doc_id, list(__xxh) AS hl FROM hx GROUP BY doc_id),
        |fps AS (
        |  SELECT doc_id,
        |    CAST((fpu + 9223372036854775808) % 18446744073709551616
        |         - 9223372036854775808 AS BIGINT) AS fp
        |  FROM (
        |    SELECT doc_id,
        |      list_sum(list_transform(range(0, 64), bb ->
        |        CASE WHEN 2 * len(list_filter(hl, x ->
        |               (((CAST(x AS HUGEINT) + 18446744073709551616) % 18446744073709551616)
        |                // (${XxHash64Sql.pow2Sql})[bb+1]) % 2 = 1))
        |               - len(hl) > 0
        |             THEN (${XxHash64Sql.pow2Sql})[bb+1]
        |             ELSE CAST(0 AS HUGEINT) END)) AS fpu
        |    FROM hs))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        |FROM fps a JOIN fps b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3 AND b.doc_id >= 10000
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val fpOf = (df: org.apache.spark.sql.DataFrame) => df.select(
        col("doc_id").as("id"),
        Dedup.simhash(Dedup.shingles(col("text"), 3)).as("fp"))
      // stored side: fingerprints only, the text never re-enters the plan
      val stored = fpOf(d.filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text")))
      val batch = fpOf(d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      Dedup.simhashNearDupFromFps(stored.unionAll(batch),
          col("id"), col("fp"), maxHamming = 3)
        .filter(col("id_b") >= 10000)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long")
          .as("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // SemDeDup (Abbas et al. 2023): cluster embeddings, dedup within
    // clusters, keep the least-prototypical member per group. Rows-only
    // (k-means is not SQL-reproducible); check_passed asserts that every
    // planted exact copy resolved into a group that kept exactly one of
    // the pair.
    "semantic_dedup" -> Q.noOracle { (s, dir) =>
      import graft.pipeline.SemDedup
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val planted = emb.unionAll(emb.filter(col("id") < 20)
        .select((col("id") + 10000).as("id"), col("vec")))
      val out = SemDedup.semDedup(planted, col("id"), col("vec"),
        numCells = 8, maxDistance = 1e-6)
        .localCheckpoint(true) // feeds both the planted check and the output
      val pairCheck = out.filter(col("id") < 20).select(col("id"),
          col("canonical").as("c_a"), col("keep").as("k_a"))
        .join(out.filter(col("id") >= 10000)
          .select((col("id") - 10000).as("id"),
            col("canonical").as("c_b"), col("keep").as("k_b")), Seq("id"))
        .agg(sum(when(col("c_a") === col("c_b") &&
          col("k_a") + col("k_b") === 1, 1).otherwise(0)).as("n_resolved"))
      out.crossJoin(broadcast(pairCheck))
        .withColumn("check_passed", col("n_resolved") === 20)
        .select(col("id"), col("cell").cast("long").as("cell"),
          col("centroid_dist"), col("canonical"), col("keep"),
          col("check_passed"))
        .orderBy(col("id"))
    },

    // SemDeDup under a FULL hash oracle via pinned centroids (the
    // ivf_pruned_fixed trick — trained k-means is not SQL-replayable, a
    // fixed centroid set is): DuckDB replays assignment → centroid
    // distance → within-cell pairs → connected components (recursive CTE
    // min-propagation) → keep-farthest-from-centroid representative.
    // Planted rows are NEAR-dups, not exact copies: each perturbs its
    // base by +(1/128)·((i−1) mod 3) per element — pair distance ~3e-3
    // (under the 0.02 threshold) while the two members' centroid
    // distances DIFFER, so the keep-farthest rule decides every
    // component and a keep-rule mutation turns this gate red (the r16
    // gate-sensitivity audit caught the exact-copy fixture as
    // keep-rule-insensitive: identical vectors ⇒ identical centroid
    // dists ⇒ the id tiebreak decided everything). 1/128 is a binary
    // power, so float(v)+inc is bit-identical to DuckDB's
    // double-compute-then-cast replay.
    "semantic_dedup_fixed" -> Q(
      """WITH RECURSIVE cents AS (
        |  SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |base AS (
        |  SELECT vec_id AS id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000 AS id,
        |         list_transform(range(1, len(embedding) + 1),
        |           i -> (embedding[i] + 0.0078125 * ((i - 1) % 3))::FLOAT)
        |           AS embedding
        |  FROM embeddings WHERE vec_id < 20
        |),
        |v AS (SELECT id, embedding::DOUBLE[] AS ve FROM base),
        |assigned AS (
        |  SELECT v.id, v.ve,
        |         (SELECT c.cell FROM cents c
        |          ORDER BY 1 - list_cosine_similarity(v.ve, c.cv), c.cell
        |          LIMIT 1) AS cell
        |  FROM v),
        |wd AS (
        |  SELECT a.id, a.cell, a.ve,
        |         round(1 - list_cosine_similarity(a.ve, c.cv), 6) AS centroid_dist
        |  FROM assigned a JOIN cents c ON a.cell = c.cell),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM wd a JOIN wd b ON a.cell = b.cell AND a.id < b.id
        |  WHERE round(1 - list_cosine_similarity(a.ve, b.ve), 6) <= 0.02),
        |und AS (SELECT id_a AS s, id_b AS t FROM pairs
        |        UNION ALL SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT s AS id FROM und),
        |r(id, c) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT u.s, r.c FROM und u JOIN r ON u.t = r.id),
        |comp AS (SELECT id, min(c) AS canonical FROM r GROUP BY id),
        |ranked AS (
        |  SELECT w.id, m.canonical,
        |         row_number() OVER (PARTITION BY m.canonical
        |                            ORDER BY w.centroid_dist DESC, w.id) AS rk
        |  FROM wd w JOIN comp m ON w.id = m.id)
        |SELECT w.id, CAST(w.cell AS BIGINT) AS cell, w.centroid_dist,
        |       coalesce(k.canonical, w.id) AS canonical,
        |       CAST(CASE WHEN k.id IS NULL OR k.rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM wd w LEFT JOIN ranked k ON w.id = k.id
        |ORDER BY w.id""".stripMargin
    ) { (s, dir) =>
      import graft.pipeline.SemDedup
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val planted = emb.unionAll(emb.filter(col("id") < 20)
        .select((col("id") + 10000).as("id"),
          transform(sequence(lit(1), size(col("vec"))),
            i => element_at(col("vec"), i) +
              lit(0.0078125f) * pmod(i - 1, lit(3)).cast("float"))
            .as("vec")))
      val cents = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 8)
        .orderBy("vec_id").select("embedding").collect()
        .map(_.getSeq[Float](0).toArray)
      val ix = graft.ann.Ivf.Index(cents, planted.withColumn("cell",
        graft.ann.Ivf.cellOf(col("vec"), cents, "cosine")), "cosine")
      SemDedup.semDedupWithIndex(ix, maxDistance = 0.02)
        .select(col("id"), col("cell").cast("long").as("cell"),
          col("centroid_dist"), col("canonical"),
          col("keep").cast("long").as("keep"))
        .orderBy(col("id"))
    },

    // Learned quality filter (the GPT-3/CCNet fastText-style step):
    // LR over hashed tokens, trained on a planted separable labeling
    // (docs mentioning 'table'), scored on the deterministic holdout.
    // check_passed asserts the holdout accuracy — the plumbing is what's
    // gated; LR weights are not SQL-reproducible, hence rows-only.
    "quality_classifier" -> Q.noOracle { (s, dir) =>
      import graft.pipeline.QualityClassifier
      val labeled = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("label",
          array_contains(split(lower(col("text")), "\\s+"), "table").cast("int"))
      // session-lifetime memo (core.IndexCache contract): the model is
      // collection state like a BM25 index — rebuilding per query would
      // misrepresent the cost model (fit = ~50 LBFGS jobs)
      val (model, acc) = graft.core.IndexCache.getOrBuild(s"qualclf:$dir") {
        QualityClassifier.trainEval(
          labeled, col("text"), col("label"), col("doc_id"))
      }
      val holdout = labeled.filter(
        QualityClassifier.holdoutBucket(col("doc_id")) <
          QualityClassifier.holdoutBucketCutoff())
      QualityClassifier.score(model, holdout, col("text"))
        .select(col("doc_id"), col("label").cast("long").as("label"),
          col("quality_pred"))
        .withColumn("check_passed", lit(acc >= 0.9))
        .orderBy(col("doc_id"))
    },

    // Learned quality filter under a FULL hash oracle via pinned weights
    // (the pinned-parameter replay trick): a trained LR is not
    // SQL-reproducible, but a FROZEN coefficient vector over an explicit
    // vocabulary is — DuckDB replays tokenize → tf-count → dot-product →
    // margin/sigmoid/threshold. The decision thresholds the exact margin
    // (integer counts × literal weights, fixed fold order), so no libm
    // call participates; the trained-path self-check (`quality_classifier`)
    // stays beside this gate.
    "quality_classifier_fixed" -> Q(qcFixedSql) { (s, dir) =>
      import graft.pipeline.QualityClassifier
      QualityClassifier.scorePinned(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("text")),
        col("text"), qcVocab, qcWeights.map(_.toDouble), qcIntercept.toDouble)
        .select(col("doc_id"),
          round(col("quality_margin"), 6).as("quality_margin"),
          col("quality_pred"),
          round(col("quality_prob"), 6).as("quality_prob"))
        .orderBy(col("doc_id"))
    },

    // CCNet-style LM perplexity scoring (Wenzek et al. 2019): add-one
    // unigram LM over the corpus token stream, per-doc mean negative
    // log-likelihood + perplexity. Fully SQL-replayable (the BM25 oracle
    // established ln() parity); ppl derives from the UNROUNDED nll on
    // both sides, then rounds.
    "unigram_perplexity" -> Q(
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |           string_split_regex(lower(text), '[^a-z0-9]+'),
        |           t -> len(t) > 1 AND t NOT IN ($stopList))) AS term
        |  FROM documents),
        |counts AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        |tot AS (SELECT sum(c)::DOUBLE AS n, count(*)::DOUBLE AS v FROM counts),
        |lm AS (SELECT term, ln((c + 1.0) / (t.n + t.v)) AS log_p
        |       FROM counts CROSS JOIN tot t),
        |s AS (SELECT toks.doc_id, count(*) AS n_tokens, avg(-lm.log_p) AS nll
        |      FROM toks JOIN lm USING (term) GROUP BY toks.doc_id)
        |SELECT d.doc_id,
        |       coalesce(s.n_tokens, 0) AS n_tokens,
        |       round(s.nll, 6) AS nll,
        |       round(exp(s.nll), 4) AS ppl
        |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.pipeline.Perplexity
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val lm = Perplexity.unigramLm(docs, col("text"))
      Perplexity.score(docs, col("doc_id"), col("text"), lm)
        .select(col("doc_id"), col("n_tokens"),
          round(col("nll"), 6).as("nll"), round(col("ppl"), 4).as("ppl"))
        .orderBy(col("doc_id"))
    },

    // Interpolated-bigram perplexity (one step toward CCNet's KenLM):
    // p(t|prev) = 0.7·c(prev,t)/c(prev) + 0.3·p_uni(t); first token
    // scores unigram-only. DuckDB replays the lag-window pairing and both
    // count tables. (The λ literals differ between engines by one ulp of
    // 0.3 — relative 2e-16, invisible at the 6-decimal contract.)
    "bigram_perplexity" -> Q(
      s"""WITH w AS (
        |  SELECT doc_id, list_filter(
        |           string_split_regex(lower(text), '[^a-z0-9]+'),
        |           t -> len(t) > 1 AND t NOT IN ($stopList)) AS arr
        |  FROM documents),
        |toks AS (SELECT doc_id, generate_subscripts(arr, 1) AS pos,
        |                unnest(arr) AS term FROM w),
        |paired AS (SELECT doc_id, pos, term,
        |                  lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |           FROM toks),
        |uc AS (SELECT term, count(*) AS c1 FROM toks GROUP BY term),
        |tot AS (SELECT sum(c1)::DOUBLE AS n, count(*)::DOUBLE AS v FROM uc),
        |uni AS (SELECT term, (c1 + 1.0) / (t.n + t.v) AS p_uni
        |        FROM uc CROSS JOIN tot t),
        |bc AS (SELECT prev, term, count(*) AS c2 FROM paired
        |       WHERE prev IS NOT NULL GROUP BY prev, term),
        |p AS (SELECT pr.doc_id,
        |             CASE WHEN pr.prev IS NULL THEN u.p_uni
        |                  ELSE 0.7 * (coalesce(b.c2, 0)::DOUBLE / u2.c1::DOUBLE)
        |                       + (1.0 - 0.7) * u.p_uni END AS p
        |      FROM paired pr
        |      JOIN uni u ON pr.term = u.term
        |      LEFT JOIN uc u2 ON pr.prev = u2.term
        |      LEFT JOIN bc b ON pr.prev = b.prev AND pr.term = b.term),
        |s AS (SELECT doc_id, count(*) AS n_tokens, avg(-ln(p)) AS nll
        |      FROM p GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(s.n_tokens, 0) AS n_tokens,
        |       round(s.nll, 6) AS nll, round(exp(s.nll), 4) AS ppl
        |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.pipeline.Perplexity
      Perplexity.scoreBigram(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("text")),
        col("doc_id"), col("text"), lambda = 0.7)
        .select(col("doc_id"), col("n_tokens"),
          round(col("nll"), 6).as("nll"), round(col("ppl"), 4).as("ppl"))
        .orderBy(col("doc_id"))
    },

    // DSIR importance-weighted data selection (Xie et al. 2023): hashed
    // uni+bigram bucket LM ratio of target (lang='en') vs raw, per-doc
    // mean log-ratio, deterministic top-50. The oracle replays the
    // bucket hashing through XxHash64Sql (the minhash parity machinery)
    // and both count tables; ordering is by the 6-decimal rounded
    // weight with doc_id ties on both sides.
    "dsir_select" -> Q(
      s"""WITH w AS (
        |  SELECT doc_id, lang, list_filter(
        |           string_split_regex(lower(text), '[^a-z0-9]+'),
        |           t -> len(t) > 1 AND t NOT IN ($stopList)) AS arr
        |  FROM documents),
        |toks AS (SELECT doc_id, lang, generate_subscripts(arr, 1) AS pos,
        |                unnest(arr) AS term FROM w),
        |big AS (SELECT doc_id, lang, prev || ' ' || term AS term
        |        FROM (SELECT doc_id, lang, pos, term,
        |                     lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |              FROM toks)
        |        WHERE prev IS NOT NULL),
        |feats AS (SELECT doc_id, lang, term FROM toks
        |          UNION ALL SELECT doc_id, lang, term FROM big),
        |hx AS ${XxHash64Sql.wrap("SELECT doc_id, lang, term FROM feats", "term")},
        |fb AS (SELECT doc_id, lang,
        |              ((__xxh % 8192) + 8192) % 8192 AS bucket FROM hx),
        |bc AS (SELECT bucket, count(*) AS cr,
        |              sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        |       FROM fb GROUP BY bucket),
        |tot AS (SELECT sum(cr)::DOUBLE AS nr, sum(ct)::DOUBLE AS nt FROM bc),
        |lr AS (SELECT bucket,
        |              ln((ct + 1.0) / (t.nt + 8192.0))
        |              - ln((cr + 1.0) / (t.nr + 8192.0)) AS logr
        |       FROM bc CROSS JOIN tot t),
        |s AS (SELECT fb.doc_id, count(*) AS n_feats, avg(lr.logr) AS wt
        |      FROM fb JOIN lr USING (bucket) GROUP BY fb.doc_id)
        |SELECT doc_id, n_feats, round(wt, 6) AS weight
        |FROM s ORDER BY round(wt, 6) DESC, doc_id LIMIT 50""".stripMargin
    ) { (s, dir) =>
      import graft.pipeline.Dsir
      val docs = Tables.load(s, dir, "documents")
      Dsir.selectTop(
        Dsir.score(docs, col("doc_id"), col("text"), col("lang") === "en"),
        50)
    },

    // Gopher/MassiveText quality-filter rule set (Rae et al. 2021 A1) —
    // one 0/1 column per rule so the gate checks each rule's semantics.
    // doc 900001 is PLANTED at two rule boundaries the word-salad corpus
    // never reaches (r17 mutation-audit finding: an alpha-threshold
    // 0.8→0.95 mutation stayed green): exactly 50 words (the word-count
    // lo bound) of which 45 are alphabetic (ratio 0.9 ∈ [0.8, 0.95)) and
    // exactly 2 of the 8 reference stopwords.
    "gopher_rules" -> Q(
      """WITH w AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0) AS ws,
        |         string_split(text, chr(10)) AS lines
        |  FROM (SELECT doc_id, text FROM documents
        |        UNION ALL SELECT 900001, '""".stripMargin +
        gopherBoundaryText + """')),
        |m AS (
        |  SELECT doc_id, text, ws, lines,
        |         len(ws) AS n_words,
        |         CASE WHEN len(ws) = 0 THEN 0.0
        |              ELSE list_sum(list_transform(ws, x -> length(x))) * 1.0 / len(ws) END AS mwl,
        |         length(text) - length(replace(text, '#', '')) AS n_hash,
        |         (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell,
        |         len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
        |         len(list_filter(['the','be','to','of','and','that','have','with'],
        |             s -> list_contains(string_split_regex(lower(trim(text)), '\s+'), s))) AS n_stops,
        |         len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS n_bullet,
        |         len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS n_ellline,
        |         len(lines) AS n_lines
        |  FROM w)
        |SELECT doc_id,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_word_count,
        |  CAST(CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END AS BIGINT) AS r_mean_word_len,
        |  CAST(CASE WHEN n_words > 0 AND (n_hash + n_ell) * 1.0 / n_words <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS r_symbol_ratio,
        |  CAST(CASE WHEN n_bullet * 1.0 / n_lines <= 0.9 THEN 1 ELSE 0 END AS BIGINT) AS r_bullet_lines,
        |  CAST(CASE WHEN n_ellline * 1.0 / n_lines <= 0.3 THEN 1 ELSE 0 END AS BIGINT) AS r_ellipsis_lines,
        |  CAST(CASE WHEN n_words > 0 AND n_alpha * 1.0 / n_words >= 0.8 THEN 1 ELSE 0 END AS BIGINT) AS r_alpha_words,
        |  CAST(CASE WHEN n_stops >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop_words
        |FROM m ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val flags = TextAnalysis.gopherFlags(col("text"))
      Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
        .unionAll(s.range(1).select(lit(900001L).as("doc_id"),
          lit(gopherBoundaryText).as("text")))
        .select(col("doc_id") +: flags.map { case (n, c) => c.as(n) }: _*)
        .orderBy(col("doc_id"))
    },

    // C4 cleaning rules (Raffel et al. 2020 §2.2) over pages assembled
    // deterministically from the word-salad docs: terminal-punctuation
    // line filter, ≥5-word lines, javascript-line drop, lorem-ipsum /
    // curly-brace page drop, ≥3-sentence minimum. The retained text is
    // part of the compared output, so the line filter itself is oracle-
    // checked, not just the flags.
    "c4_rules" -> Q(
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0) AS ws
        |           FROM documents WHERE doc_id < 150),
        |pages AS (SELECT doc_id, concat_ws(chr(10),
        |    coalesce(array_to_string(ws[1:8], ' '), '') || '. second bit done. third bit here.',
        |    coalesce(array_to_string(ws[9:12], ' '), ''),
        |    coalesce(array_to_string(ws[13:18], ' '), '') || ' uses javascript here.',
        |    CASE WHEN doc_id % 5 = 0 THEN 'lorem ipsum dolor sit amet.' END,
        |    CASE WHEN doc_id % 7 = 0 THEN 'function() { return 1; }' END,
        |    'exactly five words kept here.') AS text
        |  FROM w),
        |r AS (SELECT doc_id, text,
        |    list_filter(string_split(text, chr(10)),
        |      l -> regexp_matches(trim(l), '[.!?"]$')
        |       AND len(list_filter(string_split_regex(trim(l), '\s+'), x -> length(x) > 0)) >= 5
        |       AND NOT list_contains(string_split_regex(lower(trim(l)), '[^a-z0-9]+'), 'javascript')) AS kept,
        |    len(string_split(text, chr(10))) AS n_lines
        |  FROM pages)
        |SELECT doc_id,
        |  array_to_string(kept, chr(10)) AS retained,
        |  CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
        |  CAST(len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]')) AS BIGINT) AS n_sentences,
        |  CAST(CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END AS BIGINT) AS has_lorem,
        |  CAST(CASE WHEN contains(text, '{') THEN 1 ELSE 0 END AS BIGINT) AS has_brace,
        |  CAST(CASE WHEN len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]')) >= 3
        |        AND NOT contains(lower(text), 'lorem ipsum')
        |        AND NOT contains(text, '{') THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM r ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val words = filter(split(trim(col("text")), "\\s+"), w => length(w) > 0)
      val page = concat_ws("\n",
        concat(array_join(slice(words, 1, 8), " "),
          lit(". second bit done. third bit here.")),
        array_join(slice(words, 9, 4), " "),
        concat(array_join(slice(words, 13, 6), " "), lit(" uses javascript here.")),
        when(col("doc_id") % 5 === 0, lit("lorem ipsum dolor sit amet.")),
        when(col("doc_id") % 7 === 0, lit("function() { return 1; }")),
        // exactly minLineWords words + terminal punct: the planted line AT
        // the >= 5 boundary, so a minLineWords mutation is gate-visible
        // (every other fixture line is comfortably above or below it)
        lit("exactly five words kept here."))
      val paged = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 150)
        .select(col("doc_id"), page.as("text"))
      paged.select(col("doc_id") +:
          TextAnalysis.c4Flags(col("text")).map { case (n, c) => c.as(n) }: _*)
        .orderBy(col("doc_id"))
    },

    // Frequency-based boilerplate line removal (RefinedWeb/CCNet): lines
    // appearing in >= 100 distinct docs drop from EVERY doc. Pages are
    // assembled deterministically with planted boilerplate on both sides.
    "boilerplate_lines" -> Q(
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0) AS ws
        |           FROM documents),
        |pages AS (SELECT doc_id, concat_ws(chr(10),
        |    coalesce(array_to_string(ws[1:8], ' '), ''),
        |    CASE WHEN doc_id % 2 = 0 THEN 'Subscribe to our newsletter today!' END,
        |    CASE WHEN doc_id < 100 THEN 'Limited time offer ends soon' END,
        |    'Copyright Example Corp',
        |    coalesce(array_to_string(ws[9:14], ' '), '')) AS text
        |  FROM w),
        |lines AS (SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line,
        |    unnest(range(0, len(string_split(text, chr(10))))) AS line_idx
        |  FROM pages),
        |n AS (SELECT doc_id, line_idx, line,
        |             regexp_replace(lower(trim(line)), '\s+', ' ', 'g') AS norm FROM lines),
        |hot AS (SELECT norm FROM n WHERE norm <> ''
        |        GROUP BY norm HAVING count(DISTINCT doc_id) >= 100)
        |SELECT doc_id,
        |       coalesce(string_agg(CASE WHEN h.norm IS NULL THEN line END, chr(10) ORDER BY line_idx), '') AS retained_text,
        |       count(*) AS n_lines,
        |       CAST(sum(CASE WHEN h.norm IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM n LEFT JOIN hot h ON n.norm = h.norm
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val words = filter(split(trim(col("text")), "\\s+"), w => length(w) > 0)
      val page = concat_ws("\n",
        array_join(slice(words, 1, 8), " "),
        when(col("doc_id") % 2 === 0, lit("Subscribe to our newsletter today!")),
        // EXACTLY minDocFreq distinct docs (ids 0..99 all exist at sf0.01):
        // the only line AT the df >= 100 boundary — the natural hot lines
        // sit at 500 and 250, which left a `>` mutation invisible (r18
        // audit); this one is dropped by `>=` and kept by `>`.
        when(col("doc_id") < 100, lit("Limited time offer ends soon")),
        lit("Copyright Example Corp"),
        array_join(slice(words, 9, 6), " "))
      val paged = Tables.load(s, dir, "documents")
        .select(col("doc_id"), page.as("text"))
      Dedup.boilerplateLines(paged, col("doc_id"), col("text"), minDocFreq = 100)
        .orderBy(col("doc_id"))
    },

    // PII detect → redact → density-drop (the C4/CCNet/Dolma scrub step)
    // over a corpus with deterministically planted emails/phones/IPs.
    "pii_scrub" -> Q(
      """WITH docs AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 10 = 0
        |              THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1 555-123-4567 at 192.168.1.' || CAST(doc_id % 255 AS VARCHAR) || ' see https://example.com/d/' || CAST(doc_id AS VARCHAR)
        |              ELSE text END AS text
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '(?:\+?[0-9]{1,3}[- .]?)?\(?[0-9]{3}\)?[- .]?[0-9]{3}[- .]?[0-9]{4}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
        |  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_url,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '|||EMAIL|||', 'g'),
        |      '(?:\+?[0-9]{1,3}[- .]?)?\(?[0-9]{3}\)?[- .]?[0-9]{3}[- .]?[0-9]{4}', '|||PHONE|||', 'g'),
        |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '|||IP|||', 'g'),
        |      'https?://[^\s]+', '|||URL|||', 'g') AS redacted,
        |  CAST(CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) = 0
        |         AND len(regexp_extract_all(text, '(?:\+?[0-9]{1,3}[- .]?)?\(?[0-9]{3}\)?[- .]?[0-9]{3}[- .]?[0-9]{4}')) = 0
        |         AND len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) = 0
        |         AND len(regexp_extract_all(text, 'https?://[^\s]+')) = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM docs ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.pipeline.Pii
      val planted = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 0,
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"), lit("@example.com or +1 555-123-4567 at 192.168.1."),
              (col("doc_id") % 255).cast("string"),
              lit(" see https://example.com/d/"), col("doc_id").cast("string")))
            .otherwise(col("text")).as("text"))
      planted.select(
        col("doc_id") +:
          Pii.detect(col("text")).map { case (n, c) => c.as(n) } :+
          Pii.redact(col("text")).as("redacted") :+
          when(Pii.dropDense(col("text"), maxPerDoc = 0), 1L).otherwise(0L).as("keep"): _*)
        .orderBy(col("doc_id"))
    },

    // Span-level exact dedup (Lee et al. 2021 shape): 20-word windows,
    // global first-occurrence survives, documents rebuilt from kept spans.
    "span_dedup" -> Q(
      s"""WITH docs AS $dupUnionSql,
         |w AS (SELECT doc_id,
         |             list_filter(string_split_regex(trim(text), '\\s+'),
         |                         x -> length(x) > 0) AS ws
         |      FROM docs),
         |spans AS (
         |  SELECT doc_id, CAST(i AS INT) AS span_idx,
         |         array_to_string(ws[CAST(i*20+1 AS BIGINT):CAST(i*20+20 AS BIGINT)], ' ') AS span
         |  FROM w, unnest(range(0, greatest(CAST(ceil(len(ws)/20.0) AS BIGINT), 1))) AS t(i)),
         |ranked AS (SELECT doc_id, span_idx, span,
         |                  row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
         |           FROM spans)
         |SELECT doc_id,
         |       coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY span_idx), '') AS retained_text,
         |       count(*) AS n_spans,
         |       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Dedup.spanDedup(withPlantedDups(s, dir), col("doc_id"), col("text"),
        spanWords = 20)
        .orderBy(col("doc_id"))
    },
  )
}
