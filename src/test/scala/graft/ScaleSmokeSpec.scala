package graft

import org.apache.spark.sql.functions._

/** Bounded-time scale smoke tests: the blocked/banded operators run at
  * 10-20k rows — two orders past the oracle fixtures — and must finish in
  * seconds because their work is candidate-bounded, where the naive
  * quadratic forms would materialize 10⁸+ pairs. Complements
  * PlanAuditSpec (which proves the SHAPE) with an execution-level check.
  */
class ScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  test("blocked graph build at 10k vectors stays candidate-bounded") {
    val rnd = new scala.util.Random(13)
    val centers = Array.tabulate(16)(i =>
      Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    val data = (0 until 10000).map { i =>
      val c = centers(i % 16)
      (s"v$i", c.map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    }.toDF("id", "vector").repartition(8)
    val edges = graft.ops.SemanticGraph.buildBlocked(
      data, col("id"), col("vector"), k = 5, numCells = 64, nprobe = 2)
    val n = edges.count()
    // every node found k neighbors through its probed cells
    assert(n == 10000L * 5, s"edge count $n")
  }

  test("graph query at 100k nodes: join-BFS stays assigned-bounded, " +
      "min-hop semantics hold on a known chain+skip structure") {
    val nodes = spark.range(100000).select(
      col("id").cast("string").as("id"),
      array(col("id").cast("float")).as("vector"))
    val edges = spark.range(100000).select(
        col("id").cast("string").as("src"),
        (col("id") + 1).cast("string").as("dst"), lit("next").as("edge_type"))
      .unionByName(spark.range(100000).select(
        col("id").cast("string").as("src"),
        (col("id") + 50000).cast("string").as("dst"),
        lit("skip").as("edge_type")))
    // 1-dim euclidean: distance = |i - 777|, so seeds (k=3 → 2k=6) are
    // exactly 774..779 (the two distance-3 nodes tie; "774" < "780")
    val assigned = graft.ops.GraphQuery.assignments(nodes, edges,
      Array(777f), k = 3, maxHops = 2, metric = "euclidean").collect()
    val byId = assigned.map(r => r.getString(0) -> r).toMap
    assert((774 to 779).forall(i => byId(i.toString).getAs[Int]("hops") == 0))
    // skip edge from seed 777 lands at 50777 in one hop
    assert(byId("50777").getAs[Int]("hops") == 1)
    assert(byId("50777").getAs[scala.collection.Seq[String]]("path") ==
      Seq("777", "50777"))
    // next edge off the seed window: 780 is 1 hop from seed 779
    assert(byId("780").getAs[Int]("hops") == 1)
    // two hops: next off the hop-1 frontier (780→781) and skip off it
    // (780→50780); the skip edges out of the 50k band dangle past the
    // node table and drop, like the reference's missing-target skip
    assert(byId("781").getAs[Int]("hops") == 2)
    assert(byId("50780").getAs[Int]("hops") == 2)
    assert(!byId.contains("100777"))
    // assigned set stays frontier-bounded: 6 seeds + ≤12 + ≤24
    assert(assigned.length <= 6 + 12 + 24, s"assigned ${assigned.length}")
  }

  test("encrypted search at 30k vectors: planted duplicate recovered at " +
      "Hamming 0, join-free plan") {
    import graft.ann.EncryptedSearch
    // 64-dim vectors so 64-bit sign codes don't collide across rows
    val planes = EncryptedSearch.generateHyperplanes(64, 64, 42L)
    val base = spark.range(30000).select(col("id").cast("string").as("id"),
      transform(sequence(lit(0), lit(63)),
        i => ((hash(col("id") * 64 + i) % 1000) / 500.0).cast("float"))
        .as("vec")).repartition(8)
    // plant an exact duplicate of row 1234's vector under a new id
    val target = base.filter(col("id") === "1234")
      .select("vec").collect()(0).getSeq[Float](0).toArray
    val withDup = base.unionByName(
      Seq(("dup", target.toSeq)).toDF("id", "vec"))
    val enc = EncryptedSearch.encrypt(withDup, col("id"), col("vec"), planes)
    val q = EncryptedSearch.encodeOne(target, planes)
    val top = EncryptedSearch.search(enc, q, totalBits = 64, k = 5)
    val rows = top.collect()
    // the original and its planted duplicate share the code word exactly
    assert(rows.take(2).map(_.getString(0)).toSet == Set("1234", "dup"))
    assert(rows.take(2).forall(_.getLong(1) == 0L))
    assert(!top.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("minhash LSH dedup at 10k docs with 1k planted dups") {
    val docs = ((0 until 10000).map { i =>
      (i.toLong, s"document number $i talks about topic${i % 50} with unique token u$i and filler words")
    } ++ (0 until 1000).map { i =>
      (100000L + i, s"document number $i talks about topic${i % 50} with unique token u$i and filler words")
    }).toDF("id", "text").repartition(8)
    val pairs = graft.pipeline.Dedup.minhashLsh(docs, col("id"), col("text"),
      n = 3, k = 64, bands = 16, threshold = 0.9)
    val planted = pairs
      .filter(col("id_b") === col("id_a") + 100000 && col("est_jaccard") === 1.0)
      .count()
    assert(planted == 1000L, s"planted pairs recovered: $planted")
  }

  test("drift detection over 2000 sequences x 50 entries stays grouped") {
    val rows = (0 until 100000).map { i =>
      val seq = i % 2000; val t = i / 2000
      // second half of every even sequence shifts by +3 in dim 0
      val shift = if (seq % 2 == 0 && t >= 25) 3f else 0f
      (seq, t.toLong, Seq(shift + (i % 7) * 0.01f, (i % 5) * 0.01f))
    }.toDF("seq", "ts", "vec").repartition(8)
    val d = graft.ops.Temporal.detectDrift(rows, col("seq"), col("ts"),
      col("vec"), graft.ops.Temporal.DriftMethod.KlDivergence,
      windowSize = 10, threshold = 1.0)
    assert(d.count() == 2000L)
    val flagged = d.filter(col("drift_detected")).count()
    assert(flagged == 1000L, s"even sequences flagged: $flagged")
  }

  test("CRDT convergence over a 200k-op log resolves per-id in one pass") {
    val ops = (0 until 200000).map { i =>
      val id = i % 20000
      val op = (i % 10) match {
        case 0 => "delete"; case 1 | 2 => "update"; case _ => "add"
      }
      (id.toString, op, (i / 20000).toLong, (i % 20000).toLong, (i % 3).toLong,
        i.toDouble)
    }.toDF("id", "op", "physical", "logical", "replica", "payload")
      .repartition(8)
    val state = graft.ops.Crdt.converge(ops)
    val n = state.count()
    assert(n > 0 && n <= 20000, s"alive entries: $n")
  }

  test("KG context search over a 50k-entity ring graph completes at 2 hops") {
    val entities = (0 until 50000).map(i =>
      (i.toLong, "node", Seq((i % 97) * 0.01f, (i % 89) * 0.01f)))
      .toDF("id", "entity_type", "embedding").repartition(8)
    val relations = (0 until 50000).map(i =>
      (i.toLong, ((i + 1) % 50000).toLong, "next", 1.0))
      .toDF("source", "target", "relation_type", "weight").repartition(8)
    val top = graft.ops.KnowledgeGraph.searchWithContext(entities, relations,
      Array(0.5f, 0.5f), k = 10, anchors = Seq(100L))
    assert(top.count() == 10)
    // ring: exactly ids 98..102 are within 2 undirected hops of 100
    val boosted = top.collect().filter(r => r.getAs[Any]("anchor_hops") != null)
      .map(_.getAs[Long]("id")).toSet
    assert(boosted.subsetOf(Set(98L, 99L, 100L, 101L, 102L)))
  }

  test("LOF over blocked candidate edges at 10k vectors finds planted outliers") {
    val rnd = new scala.util.Random(21)
    val centers = Array.tabulate(16)(i =>
      Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat * 2f))
    val inliers = (0 until 10000).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.05f).toSeq)
    }
    // two isolated directions, mutually orthogonal in cosine space (the
    // blocked graph's metric) so they cannot form their own dense cluster
    val outliers = Seq(
      (100000L, Seq.fill(8)(25f)),
      (100001L, Seq.tabulate(8)(d => if (d % 2 == 0) 25f else -25f)))
    val df = (inliers ++ outliers).toDF("id", "vector").repartition(8)
    // the scale path: IVF-blocked candidate edges feed the SAME LOF algebra
    val edges = graft.ops.SemanticGraph.buildBlocked(
      df, col("id"), col("vector"), k = 10, numCells = 64, nprobe = 3)
      .select(col("src"), col("dst"),
        (lit(1.0) - col("similarity")).as("distance"))
    val scores = graft.ops.Anomaly.lofFromEdges(edges)
    val top10 = scores.orderBy(col("lof_score").desc).limit(10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(outliers.map(_._1).toSet.subsetOf(top10),
      s"planted outliers must rank in blocked-edge LOF top-10, got $top10")
  }

  test("ngram jaccard at 10k docs sharing a corpus-wide hot prefix") {
    // every doc opens with the same 5 tokens -> 3 hot shingles with
    // df=10050; candidate generation must never join through them
    val docs = ((0 until 10000).map { i =>
      (i.toLong, s"the quick brown fox jumps u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")
    } ++ (0 until 50).map { i =>
      (100000L + i, s"the quick brown fox jumps u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")
    }).toDF("id", "text").repartition(8)
    val got = graft.pipeline.Dedup.ngramJaccard(docs, col("id"), col("text"),
      threshold = 0.9, maxShingleFreq = 50)
      .filter(col("id_b") === col("id_a") + 100000)
      .count()
    assert(got == 50L, s"planted pairs found: $got")
  }

  test("contamination at 50k docs vs a 500-doc benchmark stays broadcast") {
    // 500 corpus docs (1%) verbatim-contain a benchmark 8-gram; the
    // benchmark gram set is the ONLY broadcast side, the 50k corpus
    // streams through a map-side join
    val bench = (0 until 500).map { i =>
      (i.toLong, s"held out evaluation prompt b$i alpha beta gamma delta epsilon zeta")
    }.toDF("id", "text")
    val corpus = (0 until 50000).map { i =>
      if (i % 100 == 0)
        (1000000L + i, s"leading words then held out evaluation prompt b${i / 100} alpha beta gamma delta epsilon zeta trailing")
      else
        (1000000L + i, s"clean document c$i with its own content words w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g")
    }.toDF("id", "text").repartition(8)
    val flagged = graft.pipeline.Contamination.flag(
      corpus, col("id"), col("text"), bench, col("text"), n = 8)
    assert(flagged.count() == 500L)
    val plan = flagged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      "corpus side must not shuffle for the benchmark join")
  }

  test("train-prep composition at 20k docs: dedup → decontaminate → " +
       "quality → split → pack, planted drops land exactly") {
    import graft.pipeline.{Contamination, Repetition, Sampling, TextAnalysis}
    import org.apache.spark.sql.expressions.Window
    // 20k base docs; 500 exact dups of the first 500; 200 docs verbatim-
    // contain a benchmark 8-gram; 300 docs are pure repetition spam
    val base = (0 until 20000).map { i =>
      // disjoint mod-100 classes: ==1 quotes the benchmark (200 docs),
      // ==2 plus (==3, i<10000) are repetition spam (300 docs, unique
      // tails so exact dedup cannot collapse them), rest are clean
      val body =
        if (i % 100 == 1)
          s"document $i quotes held out benchmark passage q${i / 100} alpha beta gamma delta epsilon"
        else if (i % 100 == 2 || (i % 100 == 3 && i < 10000))
          s"spam spam spam spam spam spam spam s$i"
        else
          s"document number $i discusses topic${i % 97} with tokens t${i}a t${i}b t${i}c t${i}d"
      (i.toLong, body)
    }
    val corpus = (base ++ (0 until 500).map(i => (100000L + i, base(i)._2)))
      .toDF("doc_id", "text").repartition(8)
    val bench = (0 until 200).map(q =>
      (q.toLong, s"held out benchmark passage q$q alpha beta gamma delta epsilon zeta eta"))
      .toDF("bench_id", "text")
    val deduped = corpus
      .withColumn("__rn", row_number().over(
        Window.partitionBy(TextAnalysis.fingerprintMd5(col("text")))
          .orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
    assert(deduped.count() == 20000L) // the 500 planted copies removed
    val cleaned = Contamination.clean(deduped, col("doc_id"), col("text"),
      bench, col("text"), n = 8)
    assert(cleaned.count() == 19800L) // the 200 quoting docs removed
    val quality = cleaned
      .filter(Repetition.dupWordFraction(col("text")) <= 0.3)
    val nQuality = quality.count()
    assert(nQuality == 19800L - 300L, s"quality kept $nQuality")
    val train = quality
      .filter(Sampling.splitLabel(col("doc_id"), 0.8, 0.1) === "train")
      .select(col("doc_id"), size(Repetition.words(col("text"))).as("n_tok"))
    val packed = Sampling
      .packSequentialScalable(train, "doc_id", col("n_tok"), budget = 256,
        numPartitions = 8)
    val windows = packed.groupBy("window_id").agg(sum("n_tok").as("t"))
    // every window holds ≤ budget + max-doc-tokens
    assert(windows.filter(col("t") > 256 + 16).count() == 0)
    assert(packed.count() == train.count())
  }

  test("BM25 at 100k docs: stats build is grouped, query reads only " +
       "query-term postings, planted relevant doc ranks first") {
    import graft.text.{Bm25, Tokenizer}
    val docs = (0 until 100000).map { i =>
      val topic = s"topic${i % 997}"
      val body =
        if (i == 31337)
          "needle haystack needle haystack needle haystack rare treasure"
        else
          s"document about $topic with filler words alpha beta gamma u$i"
      (i.toLong, body)
    }.toDF("doc_id", "text").repartition(8)
    val ix = Bm25.index(docs, col("doc_id"), col("text"),
      Bm25.Config(stemming = false)).persisted()
    try {
      val scored = Bm25.scoreTerms(ix,
        Tokenizer.tokenize("needle haystack treasure", stemming = false))
        .orderBy(col("score").desc, col("doc_id").asc).limit(5)
      val top = scored.collect()
      assert(top.nonEmpty && top.head.getLong(0) == 31337L,
        s"planted doc must rank first: ${top.mkString(",")}")
      // only the planted doc contains any query term
      assert(top.length == 1)
    } finally ix.unpersist()
  }

  test("span dedup with a span planted in 120k docs has no skewed partition") {
    // 120k docs, each 40 words; EVERY doc shares one boilerplate span (a
    // 120k-hot key) and 500 docs are exact copies of doc 0. The hot span
    // is reduced by a map-side-combined min-struct aggregate — one
    // candidate per map partition crosses the shuffle, so no partition
    // ever holds the 120k occurrences (the old window shape did).
    val boiler = "subscribe to our newsletter for updates every single day folks " +
      "thanks for reading this page all the way to the end"
    val docs = ((0 until 120000).map { i =>
      val body = (0 until 20).map(j => s"w${(i * 37 + j * 11) % 9973}").mkString(" ")
      (i.toLong, s"$boiler $body")
    } ++ (0 until 500).map(i => (1000000L + i,
      boiler + " " + (0 until 20).map(j => s"w${j * 11 % 9973}").mkString(" ")))
    ).toDF("id", "text").repartition(16)
    val out = graft.pipeline.Dedup.spanDedup(docs, col("id"), col("text"),
      spanWords = 20).localCheckpoint(true)
    assert(out.count() == 120500L)
    // the boilerplate span survives exactly once across its 120k carriers
    val boilerDrops = out.filter(col("doc_id") < 1000000)
      .agg(sum(col("n_dropped"))).collect()(0).getLong(0)
    assert(boilerDrops >= 119999L, s"boilerplate drops: $boilerDrops")
    // the 500 exact copies of doc 0's body lose both spans
    val fullCopies = out.filter(col("doc_id") >= 1000000 &&
      col("retained_text") === "").count()
    assert(fullCopies == 500L, s"full copies emptied: $fullCopies")
  }

  test("REST layer serves a 100k-row registered table with bounded reads") {
    import org.apache.spark.sql.functions._
    val big = spark.range(100000).select(
      col("id").cast("string").as("id"),
      array(
        (col("id") % 97).cast("float"), (col("id") % 89).cast("float"),
        (col("id") % 83).cast("float")).as("vector"),
      concat(lit("""{"bucket":"""), col("id") % 10, lit("}")).as("metadata"))
    val api = new graft.server.RestApi(spark)
    api.register("big", big, dims = 3)
    // search: one job, k-bounded collect — never a full materialization
    val (ss, sb) = api.handle("POST", "/collections/big/search",
      """{"vector":[1,1,1],"k":5,"filter":{"bucket":{"$eq":3}}}""")
    assert(ss == 200)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rs = mapper.readTree(sb).get("results")
    assert(rs.size() == 5)
    (0 until 5).foreach(i =>
      assert(rs.get(i).get("metadata").get("bucket").asInt() == 3))
    // filtered count touches only the aggregate
    val (_, cb) = api.handle("POST", "/collections/big/count",
      """{"filter":{"bucket":{"$eq":3}}}""")
    assert(mapper.readTree(cb).get("count").asLong() == 10000L)
    // metadata page: offset+limit bounded collect
    val (_, qb) = api.handle("POST", "/collections/big/query",
      """{"filter":{"bucket":{"$eq":7}},"limit":3,"offset":2}""")
    val mq = mapper.readTree(qb)
    assert(mq.get("data").size() == 3)
    assert(mq.get("pagination").get("total").asLong() == 10000L)
  }

  test("semdedup at 10k vectors with 1k planted copies resolves groups") {
    val rnd = new scala.util.Random(29)
    val centers = Array.tabulate(16)(i =>
      Array.tabulate(8)(d => math.cos(i * 8 + d).toFloat))
    val base = (0 until 10000).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.05f))
    }.toDF("id", "vec")
    val corpus = base.unionAll(base.filter(col("id") < 1000)
      .select((col("id") + 100000).as("id"), col("vec"))).repartition(16)
    val out = graft.pipeline.SemDedup.semDedup(corpus, col("id"), col("vec"),
      numCells = 32, maxDistance = 1e-6).localCheckpoint(true)
    assert(out.count() == 11000L)
    val dropped = out.filter(col("keep") === 0).count()
    assert(dropped == 1000L, s"dropped: $dropped")
  }

  test("near-dup multi-assignment at 10k vectors stays cell-bounded " +
      "and beats single-assignment recall") {
    val rnd = new scala.util.Random(31)
    val centers = Array.tabulate(16)(i =>
      Array.tabulate(8)(d => math.sin(i * 5 + d * 3).toFloat))
    val base = (0 until 10000).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.05f))
    }.toDF("id", "vec")
    // 500 planted near-copies (tiny perturbation of ids 0-499)
    val corpus = base.unionAll(base.filter(col("id") < 500)
      .select((col("id") + 100000).as("id"), col("vec")))
      .repartition(16)
    val ix = graft.ann.Ivf.build(corpus, col("vec"), numCells = 32)
    def plantedHits(multiAssign: Int): Long =
      graft.ann.Ivf.nearDupBlocked(ix, "id", "vec", maxDistance = 1e-6,
          multiAssign = multiAssign)
        .filter(col("id_b") >= 100000 && col("id_a") === col("id_b") - 100000)
        .count()
    val single = plantedHits(1)
    val multi = plantedHits(2)
    // multi-assignment recovers every planted pair (identical vectors land
    // in the same nearest cell, so single should too — the invariant under
    // load is that multi never loses pairs and completes in bounded time)
    assert(multi >= single, s"multi $multi < single $single")
    assert(multi == 500L, s"multi-assign recovered $multi of 500")
  }

  test("ACL-secured search over 200k rows filters scan-side") {
    import graft.ops.Acl, Acl._, Acl.AclAction._, Acl.Effect._
    val data = spark.range(200000).select(
      col("id").cast("string").as("id"),
      concat(lit("t"), pmod(col("id"), lit(50)).cast("string")).as("tenant"),
      array(pmod(col("id") * 7L, lit(100)).cast("float"),
        pmod(col("id") * 13L, lit(100)).cast("float")).as("vec"))
      .repartition(8)
    val e = AclEngine()
      .addPolicy(AclPolicy("deny-t3", PrincipalMatcher.Any,
        ResourceMatcher.MetadataField("tenant", "t3"), Deny, Set(Search),
        priority = 10))
      .addPolicy(AclPolicy("allow-mine", PrincipalMatcher.Attribute(
        "tenant_id", "t3"), ResourceMatcher.MetadataField("tenant", "t3"),
        Allow, Set(Search), priority = 5))
      .addPolicy(AclPolicy("allow-public", PrincipalMatcher.Any,
        ResourceMatcher.MetadataField("tenant", "t7"), Allow, Set(Search)))
    val ctx = RequestContext("svc", attributes = Map("tenant_id" -> "t9"))
    // svc sees only t7 (public); t3 denied at higher priority than its
    // tenant-scoped allow (which anyway doesn't match svc)
    val res = e.securedSearch(data, ctx, col("vec"),
      lit(Array(1f, 1f)), k = 20)
    val tenants = res.select("tenant").distinct().as[String].collect()
    assert(tenants.toSeq == Seq("t7"), tenants.mkString(","))
    assert(res.count() == 20)
  }

  test("tenant usage over 500k rows x 1000 tenants is one grouped pass") {
    val lake = spark.range(500000).select(
      concat(lit("t"), pmod(col("id"), lit(1000)).cast("string"))
        .as("tenant"),
      array(lit(1f), lit(2f), lit(3f), lit(4f)).as("vec"))
      .repartition(8)
    val usage = graft.ops.Tenancy.usageByTenant(lake, "tenant", "vec")
    assert(usage.count() == 1000)
    val t42 = usage.filter(col("tenant_id") === "t42").head()
    assert(t42.getLong(1) == 500L)
    assert(t42.getLong(2) == 500L * graft.ops.Tenancy.storageEstimate(4))
    val plan = usage.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("scalable sequence packing at 100k rows matches the window form") {
    val big = spark.range(100000).select(col("id"),
      (pmod(col("id") * 40503L, lit(211)) + 1).cast("int").as("n_tok"))
      .repartition(8)
    val scalable = graft.pipeline.Sampling
      .packSequentialScalable(big, "id", col("n_tok"), budget = 2048,
        numPartitions = 16)
    val oracle = graft.pipeline.Sampling
      .packSequential(big, col("id"), col("n_tok"), budget = 2048)
    assert(scalable.select("id", "window_id")
      .except(oracle.select("id", "window_id")).count() == 0)
    assert(scalable.agg(max("window_id")).head().getLong(0) > 5000L)
  }

  // opt-in (GRAFT_SCALE_10M=1, ~1-2 min): extends the banded-dedup
  // empirical envelope an order past the in-suite smokes. Plan audits
  // prove the SHAPE at any size; this proves the constants at 10M rows.
  // maxHamming=1 → two 32-bit pigeonhole chunks, so bucket keys stay
  // sparse at 10M (the chunk-width/corpus-size knob the scaladoc
  // documents); the default maxHamming=3's 16-bit chunks are a
  // ≤~100k-per-bucket regime, not a 10M one.
  test("simhash near-dup at 10M docs: banded join, planted dups " +
      "recovered, candidate set stays bounded (opt-in)") {
    assume(sys.env.get("GRAFT_SCALE_10M").contains("1"),
      "set GRAFT_SCALE_10M=1 to run the 10M-row dedup smoke")
    val n = 10000000L
    val planted = 10000L
    // 10M distinct 8-word docs built arithmetically on executors (no
    // driver-side Seq); ids >= n replay the text of id - n → exact dups
    val src = when(col("id") >= n, col("id") - n).otherwise(col("id"))
    val wordDefs = Seq(
      2654435761L -> 1000003, 40503L -> 999983, 9176L -> 999979,
      57L -> 777767, 104729L -> 888887, 131071L -> 666667,
      8191L -> 555557, 524287L -> 444443)
    val text = concat_ws(" ", wordDefs.zipWithIndex.map {
      case ((m, p), j) =>
        concat(lit(s"t$j"), pmod(src * m + j, lit(p)).cast("string"))
    }: _*)
    val docs = spark.range(n + planted).select(col("id"), text.as("text"))
      .repartition(64)
    val pairs = graft.pipeline.Dedup.simhashNearDup(
      docs, col("id"), col("text"), n = 3, maxHamming = 1).persist()
    try {
      val total = pairs.count()
      val hit = pairs.filter(col("id_b") === col("id_a") + n &&
        col("hamming") === 0).count()
      assert(hit == planted, s"planted dups recovered: $hit")
      // candidate survivors stay near the planted count — no bucket
      // explosion (incidental hamming≤1 collisions are rare at 64 bits)
      assert(total < planted * 5, s"pair count exploded: $total")
    } finally { pairs.unpersist(); () }
  }

  // opt-in, its own gate (an order past the 10M smokes — minutes of wall
  // and several GB of shuffle): the simhash BANDING join at 100M 64-bit
  // signatures. Signatures are generated arithmetically (xxhash64 of the
  // row id — ~1.6 GB of fingerprint data) so corpus/shingle generation
  // doesn't dominate what this smoke measures: the pigeonhole equi-join
  // that is the scale path of the flagship dedup operator. maxHamming=1
  // (2×32-bit chunks) is the bound the operator scaladoc prescribes for
  // the ≥10M-corpus regime: at 100M random signatures the expected
  // 32-bit-chunk birthday collisions are ~2.3M candidate pairs (n²/2³³
  // per chunk), which the exact-hamming filter prunes to ~zero — while
  // 16-bit banding (maxHamming=3) would put ~1,500 ids in every bucket
  // and explode the candidate set quadratically.
  test("simhash banding at 100M signatures: planted near-dups recovered " +
      "exactly, incidental candidates pruned, shuffle bounded (opt-in)") {
    assume(sys.env.get("GRAFT_SCALE_100M").contains("1"),
      "set GRAFT_SCALE_100M=1 to run the 100M-signature banding smoke")
    val n = 100000000L
    val planted = 10000L
    val src = when(col("id") >= n, col("id") - n).otherwise(col("id"))
    val baseFp = xxhash64(src)
    // the planted twin of id k carries xxhash64(k) with bit (k mod 64)
    // flipped → exact hamming 1, flip position varying across the word
    val fp = when(col("id") >= n,
        baseFp.bitwiseXOR(call_function("shiftleft", lit(1L),
          pmod(src, lit(64)).cast("int"))))
      .otherwise(baseFp)
    val fps = spark.range(n + planted)
      .select(col("id"), fp.as("fp")).repartition(256)
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleWrite.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val pairs = graft.pipeline.Dedup
      .simhashNearDupFromFps(fps, col("id"), col("fp"), maxHamming = 1)
      .persist()
    try {
      val total = pairs.count()
      val hit = pairs.filter(col("id_b") === col("id_a") + n &&
        col("hamming") === 1).count()
      val wallSec = (System.nanoTime() - t0) / 1e9
      info(f"100M banding: wall=$wallSec%.1f s, " +
        f"shuffleWrite=${shuffleWrite.get / 1e9}%.2f GB, " +
        s"pairs=$total, planted-hit=$hit")
      assert(hit == planted, s"planted near-dups recovered: $hit")
      // incidental hamming<=1 survivors among random 64-bit signatures
      // are ~0 even at 100M; anything near-quadratic means the banding
      // width no longer matches the corpus size
      assert(total < planted * 5, s"pair count exploded: $total")
    } finally {
      // remove in finally: a failed count/assert must not leave the
      // listener registered, accumulating into later tests in this suite
      spark.sparkContext.removeSparkListener(listener)
      pairs.unpersist(); ()
    }
  }

  // opt-in (same gate as the banding smoke): the two-phase prefix-sum
  // pack one order past the 10M twin check, with an ANALYTIC exactness
  // oracle — tok(id) = (id·40503 mod 211) + 1 is periodic, so the exact
  // global prefix sum is (id div 211)·22366 + partial(id mod 211), a
  // narrow per-row expression. Every one of the 100M window ids is
  // checked against it; the single-partition window-form oracle that the
  // 10M test compares against would be the bottleneck here, which is the
  // point of the scalable form.
  test("sequence packing at 100M docs: every window id matches the " +
      "analytic prefix sum, shuffle bounded, driver holds only partition " +
      "totals (opt-in)") {
    assume(sys.env.get("GRAFT_SCALE_100M").contains("1"),
      "set GRAFT_SCALE_100M=1 to run the 100M-row packing smoke")
    val n = 100000000L
    val budget = 512
    val docs = spark.range(n).select(col("id"),
      (pmod(col("id") * 40503L, lit(211)) + 1).cast("int").as("n_tok"))
    // partial prefix within one 211-long period of tok(id); period total
    // = 211·210/2 + 211 = 22366 (40503 is coprime to the prime 211, so
    // each residue appears once per period)
    val partial = Array.iterate((0L, 0L), 211) { case (m, acc) =>
      (m + 1, acc + (m * 40503L) % 211L + 1L)
    }.map(_._2)
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleWrite.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val packed = graft.pipeline.Sampling
      .packSequentialScalable(docs, "id", col("n_tok"), budget = budget,
        numPartitions = 256)
    try {
      val prefix = floor(col("id") / 211L) * 22366L +
        element_at(typedLit(partial.toSeq), (pmod(col("id"), lit(211L)) + 1).cast("int"))
      val expected = floor(prefix / lit(budget.toLong))
      val bad = packed.filter(col("window_id") =!= expected).count()
      val windows = packed.agg(countDistinct(col("window_id"))).head.getLong(0)
      val wallSec = (System.nanoTime() - t0) / 1e9
      info(f"100M pack: wall=$wallSec%.1f s, " +
        f"shuffleWrite=${shuffleWrite.get / 1e9}%.2f GB, windows=$windows")
      assert(bad == 0L, s"$bad rows diverge from the analytic prefix sum")
      // every window up to the last doc's is occupied (tok < budget, so
      // consecutive floors step by at most 1); the last window is the one
      // the LAST doc starts in — its start offset is total − tok(n−1)
      val totalTok = (n / 211L) * 22366L + partial((n % 211L).toInt)
      val tokLast = (n - 1) * 40503L % 211L + 1L
      val expectedWindows = (totalTok - tokLast) / budget + 1
      assert(windows == expectedWindows,
        s"window count $windows vs expected $expectedWindows")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      packed.unpersist(); ()
    }
  }

  // opt-in (same gate): the two-phase prefix-sum twins stay row-identical
  // to their single-partition oracle forms at 10M rows — the equivalence
  // the 100k in-suite specs prove, one order past the in-suite envelope
  test("Sampling scalable twins at 10M rows match their oracle forms " +
      "(opt-in)") {
    assume(sys.env.get("GRAFT_SCALE_10M").contains("1"),
      "set GRAFT_SCALE_10M=1 to run the 10M-row sampling smoke")
    val big = spark.range(10000000L).select(col("id"),
      (pmod(col("id") * 40503L, lit(211)) + 1).cast("int").as("n_tok"))
      .repartition(64)
    val pack = graft.pipeline.Sampling
      .packSequentialScalable(big, "id", col("n_tok"), budget = 4096,
        numPartitions = 64)
      .select("id", "window_id")
    val packOracle = graft.pipeline.Sampling
      .packSequential(big, col("id"), col("n_tok"), budget = 4096)
      .select("id", "window_id")
    assert(pack.except(packOracle).count() == 0)
    assert(packOracle.except(pack).count() == 0)
    val shuf = graft.pipeline.Sampling
      .shuffleRankScalable(big.select("id"), "id", "epoch10m",
        numPartitions = 64)
      .select("id", "pos")
    val shufOracle = graft.pipeline.Sampling
      .shuffleRank(big.select("id"), col("id"), "epoch10m")
      .select("id", "pos")
    assert(shuf.except(shufOracle).count() == 0)
    assert(shufOracle.except(shuf).count() == 0)
  }

  // opt-in (same gate): the DISTRIBUTED min-label/pointer-jumping CC
  // path, which the 1M-edge small-graph fast path shields in-suite —
  // forced here (threshold 0) on its worst case: 2M nodes in 1000-long
  // CHAINS (diameter 999, where plain label propagation needs ~1000
  // supersteps and path halving must deliver O(log d)). Exact canonical
  // for every node, within the 50-superstep bound.
  test("distributed connected components at 2M chain nodes converge " +
      "with pointer jumping (opt-in)") {
    assume(sys.env.get("GRAFT_SCALE_10M").contains("1"),
      "set GRAFT_SCALE_10M=1 to run the 2M-node CC smoke")
    val n = 2000000L
    val pairs = spark.range(n)
      .filter(col("id") % 1000 =!= 999) // no edge across chain ends
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      .repartition(32)
    val comp = graft.pipeline.DedupGroups.components(
      pairs, smallGraphThreshold = 0L)
    val wrong = comp.filter(
      col("canonical") =!= (col("id") - pmod(col("id"), lit(1000)))).count()
    assert(wrong == 0L, s"nodes with wrong canonical: $wrong")
    assert(comp.select("canonical").distinct().count() == n / 1000)
    assert(comp.count() == n)
  }

  // opt-in (same gate): the GROUPED rankedByRange path — driver prefix
  // state |groups|·numPartitions — against the per-group window oracle
  // at 10M rows with a deliberately skewed group (one group holds ~30%
  // of all rows). The range partitioning on (keys ++ order) must split
  // the hot group across partitions (the scaladoc's skew claim) while
  // the prefix offsets keep ranks exact.
  test("grouped DistributedRank at 10M rows with a hot group matches " +
      "the windowed oracle (opt-in)") {
    assume(sys.env.get("GRAFT_SCALE_10M").contains("1"),
      "set GRAFT_SCALE_10M=1 to run the 10M-row grouped-rank smoke")
    import org.apache.spark.sql.expressions.Window
    val n = 10000000L
    // 97 groups; ids ≡ 0 mod 3 all collapse into group -1 → ~33% skew
    val big = spark.range(n).select(col("id"),
      when(col("id") % 3 === 0, lit(-1L))
        .otherwise(pmod(col("id") * 31L, lit(97))).as("g"),
      pmod(col("id") * 48271L, lit(1000003)).as("k"))
      .repartition(64)
    val (ranked, cleanup) = graft.ops.DistributedRank.rankedByRange(
      big, Seq("g"), Seq(col("k"), col("id")), "r", "cnt",
      numPartitions = 64)
    val got =
      try ranked.select("id", "g", "r", "cnt").localCheckpoint(true)
      finally cleanup()
    val oracle = big.withColumn("r",
        row_number().over(
          Window.partitionBy(col("g")).orderBy(col("k"), col("id")))
          .cast("long") - 1)
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("g"))))
      .select("id", "g", "r", "cnt")
    assert(got.except(oracle).count() == 0)
    assert(oracle.except(got).count() == 0)
    // the hot group really is hot, and its ranks are dense 0..cnt-1
    val hot = got.filter(col("g") === -1L)
    val hotN = hot.count()
    assert(hotN > n / 4, s"hot group rows: $hotN")
    assert(hot.agg(max("r")).head().getLong(0) == hotN - 1)
  }

  test("graph query at 10M nodes / 20M edges: join-BFS constants hold " +
      "an order past the in-suite smoke (opt-in)") {
    assume(sys.env.get("GRAFT_SCALE_10M").contains("1"),
      "set GRAFT_SCALE_10M=1 to run the 10M-node graph-BFS smoke")
    val n = 10000000L
    val nodes = spark.range(n).select(col("id").cast("string").as("id"),
      array(col("id").cast("float")).as("vector")).repartition(32)
    val edges = spark.range(n).select(
        col("id").cast("string").as("src"),
        (col("id") + 1).cast("string").as("dst"),
        lit("next").as("edge_type"))
      .unionByName(spark.range(n).select(
        col("id").cast("string").as("src"),
        (col("id") + n / 2).cast("string").as("dst"),
        lit("skip").as("edge_type")))
      .repartition(32)
    val t0 = System.nanoTime()
    // NOTE: float precision near 777777 — 1-dim euclidean on f32 ids is
    // exact below 2^24, and 777777 < 16777216, so seed ranking is exact
    val assigned = graft.ops.GraphQuery.assignments(nodes, edges,
      Array(777777f), k = 5, maxHops = 2, metric = "euclidean").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"10M-node 2-hop graph query: ${assigned.length} assigned in $secs%.1f s")
    val byId = assigned.map(r => r.getString(0) -> r).toMap
    // k=5 → 10 seeds: 777772..777781 (ties at distance 5 break to
    // "777772" < "777782" stringwise)
    assert((777772 to 777781).forall(i =>
      byId(i.toString).getAs[Int]("hops") == 0), byId.keys.toSeq.sorted)
    // hop 1: next off the window end, and the skip band
    assert(byId("777782").getAs[Int]("hops") == 1)
    assert(byId((777777 + n / 2).toString).getAs[Int]("hops") == 1)
    // hop 2: next off the hop-1 skip band
    assert(byId((777782 + n / 2).toString).getAs[Int]("hops") == 2)
    // frontier-bounded: 10 seeds + ≤20 + ≤40
    assert(assigned.length <= 70, s"assigned ${assigned.length}")
  }

  test("graph query at 1M nodes, maxHops=6: lineage checkpoint (every 4 " +
      "hops) holds BFS semantics and bounded wall-clock at depth (opt-in)") {
    assume(sys.env.get("GRAFT_SCALE_10M").contains("1"),
      "set GRAFT_SCALE_10M=1 to run the deep-hop graph-BFS smoke")
    val n = 1000000L
    val nodes = spark.range(n).select(col("id").cast("string").as("id"),
      array(col("id").cast("float")).as("vector")).repartition(32)
    val edges = spark.range(n - 1).select(
      col("id").cast("string").as("src"),
      (col("id") + 1).cast("string").as("dst"),
      lit("next").as("edge_type")).repartition(32)
    val t0 = System.nanoTime()
    val assigned = graft.ops.GraphQuery.assignments(nodes, edges,
      Array(500000f), k = 2, maxHops = 6, metric = "euclidean").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1M-node 6-hop graph query: ${assigned.length} assigned in $secs%.1f s")
    val byId = assigned.map(r => r.getString(0) -> r.getAs[Int]("hops")).toMap
    // k=2 → 4 seeds 499998..500001 (d≤2; ties at 2 break stringwise);
    // chain walks right: 500002 at hop 1 … 500007 at hop 6
    assert((499998 to 500001).forall(i => byId(i.toString) == 0), byId)
    (1 to 6).foreach(h => assert(byId((500001 + h).toString) == h, byId))
    assert(assigned.length == 10, s"assigned ${assigned.length}")
  }

  test("scalable epoch shuffle at 100k rows matches the window form") {
    val big = spark.range(100000).select(col("id")).repartition(8)
    val scalable = graft.pipeline.Sampling
      .shuffleRankScalable(big, "id", "epoch7", numPartitions = 16)
    val oracle = graft.pipeline.Sampling
      .shuffleRank(big, col("id"), "epoch7")
    // row-identical: every id gets the same global position
    assert(scalable.select("id", "pos")
      .except(oracle.select("id", "pos")).count() == 0)
    assert(oracle.select("id", "pos")
      .except(scalable.select("id", "pos")).count() == 0)
    // and it really is a permutation of 1..n
    assert(scalable.agg(max("pos")).head().getLong(0) == 100000L)
    assert(scalable.select("pos").distinct().count() == 100000L)
  }

  test("governance ops at 300k rows: RBAC read prunes scan-side, " +
      "metadata diff joins without driver maps, RAG chunking explodes " +
      "narrowly") {
    import graft.ops.Rbac._
    val lake = spark.range(300000).select(
      col("id").cast("string").as("id"),
      when(pmod(col("id"), lit(5)) === 0, "en").otherwise("de").as("lang"),
      concat(lit("s"), pmod(col("id"), lit(7)).cast("string")).as("source"),
      col("id").cast("double").as("n")).repartition(16)
    val e = new PolicyEngine(() => 1L)
    e.addPolicy(RbacPolicy("lake").addRule(
      PolicyRule("r").allow(Permission.Read)
        .withRowFilter("lang", "en").withRowFilter("source", "s3")))
    val visible = e.secureRead(lake, "lake",
      AccessToken("u", Seq("r")), Seq("lang", "source", "n"))
    // lang=en AND source=s3: id % 5 == 0 and id % 7 == 3 → id ≡ 10 mod 35
    assert(visible.count() == 300000L / 35 + 1)

    val oldSnap = lake.filter(col("id").cast("long") < 200000)
      .select(col("id"), col("source").as("metadata"))
    val newSnap = lake.filter(col("id").cast("long") >= 100000)
      .select(col("id"),
        when(col("id").cast("long") % 1000 === 0, lit("rewritten"))
          .otherwise(col("source")).as("metadata"))
    val diff = graft.ops.CodeSearch.metadataDiff(oldSnap, newSnap)
    val counts = graft.ops.CodeSearch.diffSummary(diff).head()
    assert(counts.getLong(0) == 100000L) // added: 200000-299999
    assert(counts.getLong(1) == 100000L) // removed: 0-99999
    assert(counts.getLong(2) == 100L)    // modified: 1000-step in overlap

    val docs = spark.range(20000).select(col("id"),
      concat_ws(" ", (0 until 50).map(i =>
        concat(lit(s"w$i"), pmod(col("id") + i, lit(97)))): _*).as("text"))
    val ix = graft.ops.Rag.index(docs, col("id"), col("text"),
      graft.ops.Rag.RagConfig(dims = 8, chunkSize = 20, chunkOverlap = 5))
    // 50 words, size 20, step 15: windows at 0,15,30 (45..50 reaches end)
    assert(ix.count() == 20000L * 3)
  }

  test("dashboard percentiles over a 1M-row query log with one dominant " +
      "pattern never sort on a single partition") {
    // 1M events, 90% of them one hot (collection, operation, filter, k)
    // pattern — the shape that used to serialize the whole log through a
    // Window.partitionBy(lit(1)) (insights) / one skewed key partition
    // (patterns). Exact values are cross-checked on a small slice against
    // the oracle-gated semantics; here the contract is: completes at 1M,
    // and the known closed-form percentiles come back exact.
    val log = spark.range(1000000).select(
      when(pmod(col("id"), lit(10)) < 9, "hot").otherwise(concat(lit("c"),
        pmod(col("id"), lit(7)).cast("string"))).as("collection"),
      lit("search").as("operation"),
      (pmod(col("id") * 48271L, lit(100000)).cast("double") / 1000.0)
        .as("latency_ms"),
      pmod(col("id"), lit(20)).as("result_count"),
      lit(10).as("k"), (pmod(col("id"), lit(2)) === 0).as("has_filter"),
      lit(2L).as("filter_complexity"),
      (lit(1700000000L) + col("id")).as("ts"))
      .repartition(16)
    val ins = graft.ops.QueryAnalytics.insights(log, now = 1700000000L + 1000000,
      windowSecs = 2000000L, slowThresholdMs = 99.0).head()
    // (id·48271) mod 100000 over 1M consecutive ids covers each residue
    // exactly 10 times (48271 coprime to 100000): p50 latency = value at
    // 0-based rank 500000 of the sorted multiset = 50.0 ms exactly
    assert(ins.getAs[Double]("p50_latency_ms") == 50.0)
    assert(ins.getAs[Double]("p95_latency_ms") == 95.0)
    assert(ins.getAs[Double]("p99_latency_ms") == 99.999)
    assert(ins.getAs[Long]("total_queries") == 1000000L)
    val pat = graft.ops.QueryAnalytics.patterns(log)
    val hot = pat.filter(col("collection") === "hot").collect()
    // hot pattern splits by has_filter: residues 0-8 hold 5 evens and 4
    // odds per 10 ids → 500k filtered, 400k unfiltered
    assert(hot.length == 2)
    assert(hot.map(_.getAs[Long]("count")).sorted.sameElements(
      Array(400000L, 500000L)))
  }

  test("PITR snapshot + cross-instance recovery at 300k rows stays " +
      "distributed (no driver materialization of vector data)") {
    import graft.ops.Pitr._
    val dir = java.nio.file.Files.createTempDirectory("graft-pitr-scale")
      .toString
    val big = spark.range(300000)
      .select(col("id").cast("string").as("id"),
        array((col("id") % 251).cast("float"),
          (col("id") % 983).cast("float")).as("vector"),
        concat(lit("m"), col("id") % 7).as("metadata"))
      .repartition(16)
    val registry = scala.collection.mutable.LinkedHashMap("big" -> big)
    val svc = new PitrService(spark, PitrConfig(dir),
      () => registry.keys.toSeq, registry(_), registry.update,
      () => 1000L)
    val p = svc.createSnapshot("bulk")
    assert(p.totalVectors == 300000L)
    // the snapshot is a real multi-file distributed parquet write
    val files = new java.io.File(s"$dir/${p.id}/big.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files > 1, s"expected a distributed write, got $files file(s)")
    // wreck the registry, recover from a FRESH instance (manifest reload)
    registry("big") = big.filter(lit(false))
    val svc2 = new PitrService(spark, PitrConfig(dir),
      () => registry.keys.toSeq, registry(_), registry.update,
      () => 2000L)
    val r = svc2.recoverTo(RecoveryTarget.Named("bulk"))
    assert(r.vectorsRestored == 300000L)
    // spot-check content: fixed-point vector sum over the restored rows
    val vsum = registry("big")
      .select(expr("CAST(round(aggregate(vector, CAST(0 AS DOUBLE), " +
        "(acc, x) -> acc + CAST(x AS DOUBLE))) AS BIGINT)").as("s"))
      .agg(sum("s")).head().getLong(0)
    val want = (0L until 300000L).map(i => i % 251 + i % 983).sum
    assert(vsum == want)
  }

  test("COW branching: a 16-deep branch chain over 100k rows resolves " +
      "correctly with layer-sized deltas and no cartesian in the plan") {
    import graft.ops.Branching._
    import spark.implicits._
    val base = spark.range(100000)
      .select(col("id").cast("string").as("id"),
        lit(0).as("v"), concat(lit("s"), col("id") % 5).as("s"))
    val tree = new BranchTree(base)
    // chain main -> b1 -> ... -> b16; each layer overrides 100 ids with
    // its depth marker and tombstones 10 ids from a disjoint range
    (1 to 16).foreach { i =>
      val parent = if (i == 1) "main" else s"b${i - 1}"
      tree.createBranch(s"b$i", parent)
      val ups = (0 until 100)
        .map(j => ((i * 1000 + j).toString, i, s"d$i")).toDF("id", "v", "s")
      tree.upsert(s"b$i", ups)
      tree.delete(s"b$i", (0 until 10).map(j => (90000 + i * 10 + j).toString))
    }
    val leaf = tree.resolve("b16")
    // every layer's tombstones mask; every layer's overrides win
    assert(leaf.count() == 100000L - 16 * 10)
    val v5050 = leaf.filter(col("id") === "5050").head()
    assert(v5050.getInt(1) == 5 && v5050.getString(2) == "d5")
    // a mid-chain branch sees only its ancestry's changes
    val mid = tree.resolve("b8")
    assert(mid.filter(col("id") === "8000").head().getInt(1) == 8)
    assert(mid.filter(col("id") === "9000").head().getInt(1) == 0)
    assert(mid.filter(col("id") === "12000").head().getInt(1) == 0)
    assert(mid.count() == 100000L - 8 * 10)
    // LIVE ancestry: a later write to main is visible at the leaf
    tree.upsert("main", Seq(("99999", 42, "late")).toDF("id", "v", "s"))
    assert(tree.resolve("b16").filter(col("id") === "99999")
      .head().getInt(1) == 42)
    // the 17-layer fold plans as anti-joins + unions, never a cartesian
    val plan = tree.resolve("b16").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // layers hold deltas only (110 changes each), not corpus copies
    assert(tree.branchInfo("b16").get.changeCount == 110L)
  }
}
