package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts") {
    val df = Seq("one two  three", "", "hi!").toDF("t")
    val got = df.select(TextAnalysis.tokenCountWs(col("t"))).as[Int].collect().toSeq
    assert(got == Seq(3, 0, 1))
    val bpe = Seq("hello world", "a1!").toDF("t")
      .select(TextAnalysis.tokenCountBpe(col("t"))).as[Int].collect().toSeq
    // hello(2) world(2); a(1) 1(1) !(1)
    assert(bpe == Seq(4, 3))
  }

  test("language id heuristic") {
    val cases = Seq(
      "the cat is in the house and it is warm" -> "en",
      "el gato que vive en la casa y los perros" -> "es",
      "der Hund und die Katze ist nicht das Problem" -> "de",
      "le chien et les chats de la maison une belle" -> "fr",
      "你好世界" -> "zh",
      "xyzzy qwerty" -> "und")
    val got = cases.map(_._1).toDF("t")
      .select(TextAnalysis.languageId(col("t"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("quality score bounded and fingerprint normalizes whitespace/case") {
    val df = Seq("A decent length sentence with the usual words in it.",
      "!!! ??? ...").toDF("t")
    val q = df.select(TextAnalysis.qualityScore(col("t"))).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
    val fps = Seq("Hello  World", "hello world", "other").toDF("t")
      .select(TextAnalysis.fingerprintMd5(col("t"))).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("gopher rules: each rule fires on its designed violation") {
    val good = (("the of and " + "sensible words here ") * 10).trim // 50 words, stops present
    val short = "the of too short"
    val symbols = ("### " * 30 + "the of ok " * 20).trim           // '#' soup
    val numeric = (("123 456 " * 30) + "the of").trim              // <80% alpha words
    val noStops = ("wordy content without common function terms " * 10).trim
    val df = Seq((1L, good), (2L, short), (3L, symbols), (4L, numeric), (5L, noStops))
      .toDF("id", "t")
    val flags = TextAnalysis.gopherFlags(col("t"), minWords = 20)
    val out = df.select(col("id") +: flags.map { case (n, c) => c.as(n) } :+
        TextAnalysis.gopherPass(flags).as("pass"): _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("pass") == 1L)
    assert(out(2L).getAs[Long]("r_word_count") == 0L)
    assert(out(3L).getAs[Long]("r_symbol_ratio") == 0L)
    assert(out(4L).getAs[Long]("r_alpha_words") == 0L)
    assert(out(5L).getAs[Long]("r_stop_words") == 0L)
    // the violations are disjoint: each bad doc fails overall
    Seq(2L, 3L, 4L, 5L).foreach(id => assert(out(id).getAs[Long]("pass") == 0L))
  }

  test("gopher rules: bullet and ellipsis line fractions") {
    val bullets = (Seq.fill(10)("- item line") :+ "prose the of line").mkString("\n")
    val ellipses = (Seq.fill(5)("trailing thought...") :+ "the of end").mkString("\n")
    val df = Seq((1L, bullets), (2L, ellipses)).toDF("id", "t")
    val flags = TextAnalysis.gopherFlags(col("t"), minWords = 1)
    val out = df.select(col("id") +: flags.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("r_bullet_lines") == 0L)   // 10/11 > 0.9
    assert(out(2L).getAs[Long]("r_ellipsis_lines") == 0L) // 5/6 > 0.3
  }

  test("semdedup: within-cluster duplicates collapse, farthest-from-centroid survives") {
    import graft.pipeline.SemDedup
    // two tight clusters; ids 1,2,3 identical (dup group), 4 nearby but
    // outside the dup radius; 10,11 identical in the second cluster
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val rows = Seq(
      (1L, v(1, 0, 0)), (2L, v(1, 0, 0)), (3L, v(1, 0, 0)),
      (4L, v(0.9, 0.1, 0)),
      (10L, v(0, 0, 1)), (11L, v(0, 0, 1)), (12L, v(0, 0.1, 0.9)))
      .toDF("id", "vec")
    val out = SemDedup.semDedup(rows, col("id"), col("vec"),
      numCells = 2, maxDistance = 1e-6, seed = 1L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("canonical"), r.getAs[Long]("keep"))).toMap
    // group {1,2,3}: exactly one kept, canonical = 1
    assert(Seq(1L, 2L, 3L).map(out(_)._1).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._2).sum == 1L)
    // 4 is near but not a duplicate: kept, own canonical
    assert(out(4L) == ((4L, 1L)))
    // group {10,11}: one kept
    assert(Seq(10L, 11L).map(out(_)._1).distinct == Seq(10L))
    assert(Seq(10L, 11L).map(out(_)._2).sum == 1L)
    assert(out(12L)._2 == 1L)
  }

  test("semdedup keep rule: the member FARTHEST from its centroid is the " +
      "representative (hand-computed, r16 gate-sensitivity pin)") {
    import graft.pipeline.SemDedup
    // Pinned centroids so the centroid distances are exact: cell 0 at
    // (1,0,0), cell 1 at (0,0,1). Component {1,2}: id 1 sits ON the
    // centroid (dist 0), id 2 is a near-dup ~0.005 away — both under the
    // 0.01 pair threshold, but with DISTINCT centroid dists, so only the
    // keep-least-prototypical rule (not the id tiebreak) decides: keep 2,
    // drop 1. The exact-duplicate case above can never distinguish
    // keep-farthest from keep-nearest (identical vectors ⇒ identical
    // dists) — the r16 mutation audit caught that gap.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val rows = Seq(
      (1L, v(1, 0, 0)), (2L, v(0.995, 0.1, 0)),
      (3L, v(0, 0, 1)))
      .toDF("id", "vec")
    val cents = Array(Array(1f, 0f, 0f), Array(0f, 0f, 1f))
    val ix = graft.ann.Ivf.Index(cents, rows.withColumn("cell",
      graft.ann.Ivf.cellOf(col("vec"), cents, "cosine")), "cosine")
    val out = SemDedup.semDedupWithIndex(ix, maxDistance = 0.01)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("canonical"), r.getAs[Long]("keep"))).toMap
    assert(out(2L) == ((1L, 1L)), "farther member is the representative")
    assert(out(1L) == ((1L, 0L)), "on-centroid member is dropped")
    assert(out(3L) == ((3L, 1L)))
  }

  test("unigram perplexity: repetitive docs score lower, unseen floor, " +
      "quantile filter keeps the head") {
    import graft.pipeline.Perplexity
    val rng = new scala.util.Random(11)
    // 30 docs of common vocabulary, 10 of rare scattered tokens — the
    // rare-token docs must land in the high-perplexity tail
    val docs = ((0L until 30L).map { i =>
      (i, Seq.fill(30)(s"common${rng.nextInt(5)}").mkString(" "))
    } ++ (30L until 40L).map { i =>
      (i, Seq.tabulate(30)(j => s"rare${i}x$j").mkString(" "))
    }).toDF("doc_id", "text")
    val lm = Perplexity.unigramLm(docs, col("text"))
    val scored = Perplexity.score(docs, col("doc_id"), col("text"), lm)
    val ppl = scored.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
    val commonMax = (0L until 30L).map(ppl).max
    val rareMin = (30L until 40L).map(ppl).min
    assert(rareMin > commonMax,
      s"rare-token docs must out-perplex common docs: $rareMin <= $commonMax")
    // CCNet head-cut: keeping q = 0.75 drops exactly the rare tail
    val kept = Perplexity.filterByQuantile(scored, 0.75)
      .select("doc_id").as[Long].collect().toSet
    assert((0L until 30L).forall(kept), "all common docs kept")
    assert((30L until 40L).count(kept) <= 1, "rare tail dropped")
    // unseen-token floor: a fresh doc scores at the floor, not null
    val fresh = Seq((99L, "neverseen tokens entirely")).toDF("doc_id", "text")
    val floor = math.log(1.0 / 1e9)
    val f = Perplexity.score(fresh, col("doc_id"), col("text"), lm,
      unseenLogP = floor).collect()(0)
    assert(math.abs(f.getAs[Double]("nll") - (-floor)) < 1e-9)
  }

  test("bigram perplexity is order-sensitive where unigram is not") {
    import graft.pipeline.Perplexity
    val phrase = Seq("alpha", "beta", "gamma", "delta")
    // 20 docs repeat the phrase IN ORDER; doc 99 carries the same token
    // multiset in a scrambled order — identical unigram stats by
    // construction, broken bigram transitions
    val ordered = (0L until 20L)
      .map(i => (i, Seq.fill(10)(phrase).flatten.mkString(" ")))
    val scrambled = Seq((99L,
      Seq.fill(10)(Seq("alpha", "gamma", "beta", "delta")).flatten
        .mkString(" ")))
    val docs = (ordered ++ scrambled).toDF("doc_id", "text")
    val lm = Perplexity.unigramLm(docs, col("text"))
    val uniPpl = Perplexity.score(docs, col("doc_id"), col("text"), lm)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl"))
      .toMap
    assert(math.abs(uniPpl(0L) - uniPpl(99L)) < 1e-9,
      "unigram ppl must be order-blind for an identical token multiset")
    val biPpl = Perplexity.scoreBigram(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl"))
      .toMap
    assert(biPpl(99L) > biPpl(0L) * 1.2,
      s"scrambled doc must out-perplex ordered: ${biPpl(99L)} vs ${biPpl(0L)}")
  }

  test("quality classifier learns a separable token signal") {
    import graft.pipeline.QualityClassifier
    val rng = new scala.util.Random(7)
    val vocabHi = Seq("curated", "reviewed", "citation", "edited")
    val vocabLo = Seq("spam", "clickbait", "adsense", "popup")
    val docs = (0L until 400L).map { i =>
      val hi = i % 2 == 0
      val base = Seq.fill(20)(s"word${rng.nextInt(50)}")
      val marked = base ++ Seq.fill(3)(
        if (hi) vocabHi(rng.nextInt(4)) else vocabLo(rng.nextInt(4)))
      (i, rng.shuffle(marked).mkString(" "), if (hi) 1 else 0)
    }.toDF("id", "text", "label")
    val (model, acc) = QualityClassifier.trainEval(
      docs, col("text"), col("label"), col("id"))
    assert(acc >= 0.95, s"holdout accuracy $acc")
    val fresh = Seq((1000L, "a curated reviewed citation piece of writing"),
      (1001L, "clickbait popup adsense spam garbage")).toDF("id", "text")
    val preds = QualityClassifier.score(model, fresh, col("text"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("quality_pred")).toMap
    assert(preds(1000L) == 1L && preds(1001L) == 0L)
  }

  test("quality classifier: probability read is builtin, not a scala UDF") {
    import graft.pipeline.QualityClassifier
    val seed = Seq((1L, "good curated text", 1), (2L, "bad spam text", 0),
      (3L, "more curated writing", 1), (4L, "more spam junk", 0)).toDF("id", "text", "label")
    val model = QualityClassifier.train(seed, col("text"), col("label"))
    val plan = QualityClassifier.score(model, seed, col("text"))
      .queryExecution.analyzed.toString
    assert(plan.toLowerCase(java.util.Locale.ROOT).contains("unwrap_udt"),
      plan.take(500))
    assert(!plan.contains("UDF(__prob"), "probability must not go through a scala UDF")
  }

  test("scorePinned: null text propagates null; duplicate vocab entries " +
      "count at every index") {
    import graft.pipeline.QualityClassifier
    val docs = Seq((1L, "spam spam curated"), (2L, null: String))
      .toDF("id", "text")
    // "spam" listed twice: both weights must see tf(spam)=2 — the SQL
    // replay `w1·tf(spam) + w2·tf(curated) + w3·tf(spam)` does
    val scored = QualityClassifier.scorePinned(docs, col("text"),
        vocab = Seq("spam", "curated", "spam"),
        weights = Seq(-1.0, 3.0, -0.5), intercept = 0.25)
      .select("id", "quality_margin", "quality_pred")
      .collect().map(r => r.getLong(0) -> r).toMap
    // 0.25 + (-1.0)*2 + 3.0*1 + (-0.5)*2 = 0.25
    assert(math.abs(scored(1L).getDouble(1) - 0.25) < 1e-12)
    assert(scored(1L).getLong(2) == 1L)
    // null text: margin/pred are null, not a task-killing NPE
    assert(scored(2L).isNullAt(1) && scored(2L).isNullAt(2))
  }

  test("quality classifier: empty holdout returns 0.0, not an NPE") {
    import graft.pipeline.QualityClassifier
    val seed = Seq((1L, "good curated text", 1), (2L, "bad spam text", 0),
      (3L, "more curated writing", 1), (4L, "more spam junk", 0)).toDF("id", "text", "label")
    // holdoutFrac = 0 → cutoff 0 → no row buckets below it
    val (_, acc) = QualityClassifier.trainEval(
      seed, col("text"), col("label"), col("id"), holdoutFrac = 0.0)
    assert(acc == 0.0)
    assert(QualityClassifier.holdoutBucketCutoff() == 200)
  }

  test("span dedup and boilerplate lines keep NULL-text docs as empty") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, null: String))
      .toDF("id", "t")
    val sd = Dedup.spanDedup(docs, col("id"), col("t"), spanWords = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sd.keySet == Set(1L, 2L), "null-text doc must not vanish")
    assert(sd(2L) == "")
    val bl = Dedup.boilerplateLines(docs, col("id"), col("t"), minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bl.keySet == Set(1L, 2L), "null-text doc must not vanish")
    assert(bl(2L) == "")
  }

  test("embedding near-dup guard fires past maxExactRows") {
    val vecs = (0L until 30L).map(i => (i, Array(i.toFloat, 1f))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDup(vecs, col("id"), col("v"), maxDistance = 0.1,
        maxExactRows = 10)
    }
    assert(e.getMessage.contains("nearDupBlocked"))
  }

  test("c4 rules: line filter, page drops, sentence minimum") {
    val page1 = Seq( // clean page: 3 kept lines, 3 sentences
      "this line has enough words to survive.",
      "so does this one with its terminal mark!",
      "and a third full sentence right here?").mkString("\n")
    val page2 = Seq( // line-level drops
      "too short.",                                    // <5 words
      "no terminal punctuation on this long line",     // no punct
      "we enable JavaScript on this long line.",       // javascript
      "the only surviving line is this one here.").mkString("\n")
    val page3 = "a fine sentence here. lorem ipsum dolor sit amet. done now ok."
    val page4 = "config = { \"k\": 1 } is code. more words here. end of it."
    val df = Seq((1L, page1), (2L, page2), (3L, page3), (4L, page4)).toDF("id", "t")
    val out = df.select(col("id") +:
        TextAnalysis.c4Flags(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_kept_lines") == 3 &&
      out(1L).getAs[Long]("keep") == 1)
    assert(out(2L).getAs[Long]("n_kept_lines") == 1 &&
      out(2L).getAs[String]("retained") == "the only surviving line is this one here." &&
      out(2L).getAs[Long]("keep") == 0) // 1 sentence < 3
    assert(out(3L).getAs[Long]("has_lorem") == 1 && out(3L).getAs[Long]("keep") == 0)
    assert(out(4L).getAs[Long]("has_brace") == 1 && out(4L).getAs[Long]("keep") == 0)
  }

  test("pii: detect counts, typed redaction, density drop") {
    import graft.pipeline.Pii
    val df = Seq(
      (1L, "mail me at jane.doe+spam@corp.example.org today"),
      (2L, "call +1 (415) 555-0199 or 415-555-0142"),
      (3L, "server at 10.0.0.1 and 192.168.255.254"),
      (4L, "clean prose with no identifiers at all"),
      (5L, "a@b.io c@d.io e@f.io g@h.io i@j.io k@l.io"), // 6 emails: dense
      (6L, "docs at https://example.com/a?q=1 and http://t.co/x"))
      .toDF("id", "t")
    val out = df.select(
      col("id") +: Pii.detect(col("t")).map { case (n, c) => c.as(n) } :+
        Pii.redact(col("t")).as("red") :+
        Pii.dropDense(col("t"), maxPerDoc = 5).as("keep"): _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_email") == 1 &&
      out(1L).getAs[String]("red") == "mail me at |||EMAIL||| today")
    assert(out(2L).getAs[Long]("n_phone") == 2 &&
      !out(2L).getAs[String]("red").exists(_.isDigit))
    assert(out(3L).getAs[Long]("n_ip") == 2 &&
      out(3L).getAs[String]("red") == "server at |||IP||| and |||IP|||")
    assert(out(4L).getAs[String]("red") == "clean prose with no identifiers at all"
      && out(4L).getAs[Boolean]("keep"))
    assert(out(5L).getAs[Long]("n_email") == 6 && !out(5L).getAs[Boolean]("keep"))
    assert(out(6L).getAs[Long]("n_url") == 2 &&
      out(6L).getAs[String]("red") == "docs at |||URL||| and |||URL|||")
  }

  test("rolling hash is the polynomial hash") {
    assert(TextAnalysis.rollingHash("") == 0L)
    assert(TextAnalysis.rollingHash("a") == 'a'.toLong)
    assert(TextAnalysis.rollingHash("ab") == 'a' * 31L + 'b')
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 5
  private lazy val corpus = Seq(
    (1L, base),
    (2L, base),                                    // exact dup of 1
    (3L, base.replace("lazy dog", "sleepy cat")),  // near dup of 1
    (4L, "completely different text about spark dataframes and shuffles " * 5),
    (5L, "Yet another unrelated document talking about benchmarks only " * 5),
  ).toDF("id", "text")

  test("shingles") {
    val got = Seq("a b c d").toDF("t")
      .select(Dedup.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(Dedup.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("exact dedup groups identical normalized content") {
    val got = Dedup.exact(corpus, col("id"), col("text"))
      .select("keeper", "n_copies").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("ngram jaccard finds the near-dup pair") {
    val got = Dedup.ngramJaccard(corpus, col("id"), col("text"),
      threshold = 0.3, maxShingleFreq = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) && got.contains((2L, 3L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard: a shingle shared by 1k docs never enters the pair join") {
    // every doc opens with the same three tokens (one hot shingle with
    // df=1001); the planted pair shares all its RARE shingles. Candidate
    // generation restricts to rare shingles FIRST, so the hot shingle
    // contributes zero join rows instead of ~10⁶ (regression: the old
    // formulation self-joined all postings before pruning).
    val docs = ((0 until 1000).map { i =>
      (i.toLong, s"common hot prefix u${i}a u${i}b u${i}c u${i}d u${i}e")
    } :+ (5000L, "common hot prefix u1a u1b u1c u1d u1e")).toDF("id", "text")
    val got = Dedup.ngramJaccard(docs, col("id"), col("text"),
      threshold = 0.5, maxShingleFreq = 50)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 5000L, 1.0)))
  }

  test("minhash lsh recovers exact and near dups, skips unrelated") {
    val got = Dedup.minhashLsh(corpus, col("id"), col("text"),
      k = 64, bands = 32, threshold = 0.25) // r=2: catches j≈0.4 pairs w.p. ~0.99
      .select("id_a", "id_b", "est_jaccard").as[(Long, Long, Double)].collect()
    val pairs = got.map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 2L)))
    assert(got.find(r => r._1 == 1L && r._2 == 2L).get._3 == 1.0)
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash near-dup within hamming bound") {
    val got = Dedup.simhashNearDup(corpus, col("id"), col("text"), maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val exact = got.find(r => r._1 == 1L && r._2 == 2L)
    assert(exact.nonEmpty && exact.get._3 == 0)
    assert(!got.exists(r => (r._1, r._2) == ((4L, 5L))))
  }

  test("boilerplate lines: frequency-hot lines drop from every doc") {
    val docs = Seq(
      (1L, "unique opener one\nSubscribe Now!\nbody text one"),
      (2L, "unique opener two\nsubscribe   now!\nbody text two"), // case/ws variant
      (3L, "unique opener three\nSubscribe Now!\nbody text three"),
      (4L, "no banner here at all\njust prose")).toDF("id", "t")
    val out = Dedup.boilerplateLines(docs, col("id"), col("t"), minDocFreq = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("unique opener one\nbody text one", 3L, 1L)))
    assert(out(2L) == (("unique opener two\nbody text two", 3L, 1L)))
    assert(out(3L) == (("unique opener three\nbody text three", 3L, 1L)))
    assert(out(4L) == (("no banner here at all\njust prose", 2L, 0L)))
  }

  test("span dedup: repeated spans dropped at their later occurrence") {
    // 4-word spans; doc 2 repeats doc 1's opening span, doc 3 is untouched
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta iota kappa lambda mu"),
      (3L, "nu xi omicron pi")).toDF("id", "t")
    val out = Dedup.spanDedup(df, col("id"), col("t"), spanWords = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("alpha beta gamma delta epsilon zeta eta theta", 2L, 0L)))
    assert(out(2L) == (("iota kappa lambda mu", 2L, 1L))) // first span deduped away
    assert(out(3L) == (("nu xi omicron pi", 1L, 0L)))
  }

  test("span dedup: exact duplicate doc reduces to empty text") {
    val df = Seq((1L, base), (2L, base)).toDF("id", "t")
    val out = Dedup.spanDedup(df, col("id"), col("t"), spanWords = 5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out(1L)._1.nonEmpty && out(1L)._2 == 0L)
    assert(out(2L)._1.isEmpty && out(2L)._2 > 0L)
  }

  test("span dedup: randomized differential vs in-memory reference") {
    val rnd = new scala.util.Random(41)
    // small vocab forces frequent span collisions; lengths straddle the
    // span boundary (0..11 words at span size 4)
    val docs = (0L until 120L).map { i =>
      val n = rnd.nextInt(12)
      (i, (0 until n).map(_ => s"w${rnd.nextInt(6)}").mkString(" "))
    }
    // reference: global first-occurrence by (doc, span_idx)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val expected = docs.map { case (id, text) =>
      val ws = text.trim.split("\\s+").filter(_.nonEmpty)
      val nSpans = math.max(1, math.ceil(ws.length / 4.0).toInt)
      val spans = (0 until nSpans).map(i => ws.slice(i * 4, i * 4 + 4).mkString(" "))
      val kept = spans.filter(s => seen.add(s))
      id -> ((kept.mkString(" "), nSpans.toLong, (spans.size - kept.size).toLong))
    }.toMap
    val got = Dedup.spanDedup(docs.toDF("id", "t"), col("id"), col("t"), spanWords = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    docs.foreach { case (id, _) =>
      assert(got(id) == expected(id),
        s"doc $id: got ${got(id)}, expected ${expected(id)}")
    }
  }

  test("boilerplate lines: randomized differential vs in-memory reference") {
    val rnd = new scala.util.Random(43)
    val bank = (0 until 10).map(i => s"line variant $i")
    val docs = (0L until 100L).map { i =>
      val n = 1 + rnd.nextInt(5)
      (i, (0 until n).map(_ => bank(rnd.nextInt(bank.size))).mkString("\n"))
    }
    val K = 30
    val df_ = docs.flatMap { case (id, t) =>
      t.split("\n", -1).map(_.trim.toLowerCase.replaceAll("\\s+", " "))
        .filter(_.nonEmpty).distinct.map(_ -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val hot = df_.filter(_._2 >= K).keySet
    val expected = docs.map { case (id, t) =>
      val lines = t.split("\n", -1)
      val kept = lines.filter(l =>
        !hot(l.trim.toLowerCase.replaceAll("\\s+", " ")))
      (id, (kept.mkString("\n"), lines.length.toLong,
        (lines.length - kept.length).toLong))
    }.toMap
    val got = Dedup.boilerplateLines(docs.toDF("id", "t"), col("id"), col("t"),
        minDocFreq = K)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    docs.foreach { case (id, _) =>
      assert(got(id) == expected(id), s"doc $id: got ${got(id)}, expected ${expected(id)}")
    }
  }

  test("embedding near-dup threshold join") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.999f, 0.04f, 0f)), // ~same direction
      (3L, Array(0f, 1f, 0f)),
    ).toDF("id", "v")
    val got = Dedup.embeddingNearDup(vecs, col("id"), col("v"), maxDistance = 0.01)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("DSIR selects the documents that look like the target domain") {
    import graft.pipeline.Dsir
    // two vocabularies: target docs talk about one thing, raw noise about
    // another; a held-out doc in target vocabulary must outrank the noise
    val target = (0L until 20L).map(i =>
      (i, "solar panels convert sunlight into electric power daily", true))
    val noise = (20L until 40L).map(i =>
      (i, "ancient pottery shards litter the desert excavation site", false))
    val probeT = Seq((40L, "electric power from sunlight and solar panels", false))
    val probeN = Seq((41L, "desert pottery excavation uncovered ancient shards", false))
    val docs = (target ++ noise ++ probeT ++ probeN).toDF("doc_id", "text", "is_tgt")
    val scored = Dsir.score(docs, col("doc_id"), col("text"), col("is_tgt"),
        buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(40L) > scored(41L),
      s"target-vocab probe ${scored(40L)} should outrank noise probe ${scored(41L)}")
    // and the probe scores land near their cohorts
    assert(scored(40L) > 0 && scored(41L) < 0)
    // selectTop keeps the n highest, deterministically
    val top = Dsir.selectTop(
      Dsir.score(docs, col("doc_id"), col("text"), col("is_tgt"), 1024), 21)
      .select("doc_id").as[Long].collect().toSet
    assert(top.contains(40L) && !top.contains(41L))
  }
}
