package graft

import org.apache.spark.sql.functions._

import graft.ann.Quantization
import graft.functions.Distances

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = sf("embeddings").limit(300).cache()
  private lazy val dims =
    emb.select(size(col("embedding"))).as[Int].head()

  test("SQ8 roundtrip error bounded by half a quantization step per dim") {
    val sq = Quantization.trainSq(emb, col("embedding"))
    assert(sq.dims == dims)
    val enc = emb.withColumn("codes", Quantization.sqEncode(sq)(col("embedding")))
    val row = enc.select("embedding", "codes").head()
    val v = row.getSeq[Float](0)
    val codes = row.getAs[Array[Byte]](1)
    assert(codes.length == dims)
    var i = 0
    while (i < dims) {
      val decoded = (codes(i) & 0xff).toFloat / sq.scale(i) + sq.minVals(i)
      val step = 1.0f / sq.scale(i)
      assert(math.abs(decoded - v(i)) <= step + 1e-6,
        s"dim $i: |$decoded - ${v(i)}| > $step")
      i += 1
    }
  }

  test("SQ asymmetric distance approximates exact euclidean") {
    val sq = Quantization.trainSq(emb, col("embedding"))
    val q = emb.filter(col("vec_id") === 1).select("embedding")
      .as[Seq[Float]].head().toArray
    val enc = emb.withColumn("codes", Quantization.sqEncode(sq)(col("embedding")))
    val got = enc.select(
      Distances.euclidean(col("embedding"), lit(q)).as("exact"),
      Quantization.sqAsymmetricDist(sq, q)(col("codes")).as("approx"))
      .as[(Double, Double)].collect()
    got.foreach { case (exact, approx) =>
      assert(math.abs(exact - approx) < 0.05 * math.max(1.0, exact),
        s"approx $approx too far from exact $exact")
    }
  }

  test("SQ two-phase search recall@10 >= 0.9 vs exact") {
    val sq = Quantization.trainSq(emb, col("embedding"))
    val q = emb.filter(col("vec_id") === 1).select("embedding")
      .as[Seq[Float]].head().toArray
    val enc = emb.withColumn("codes", Quantization.sqEncode(sq)(col("embedding")))
      .cache()
    val exact = emb
      .withColumn("distance", Distances.euclidean(col("embedding"), lit(q)))
      .orderBy(col("distance").asc, col("vec_id").asc).limit(10)
    val approx = Quantization.sqSearchRerank(enc, sq, q, k = 10,
      idCol = "vec_id", vecCol = "embedding")
    val r = graft.ann.Ivf.recallAtK(exact, approx, "vec_id")
    assert(r >= 0.9, s"SQ recall@10 = $r")
  }

  test("PQ ADC two-phase search recall@10 >= 0.8 and codes are 1 byte/subspace") {
    val pq = Quantization.trainPq(emb, col("embedding"), numSubvectors = 8)
    assert(pq.subDim == dims / 8)
    val q = emb.filter(col("vec_id") === 1).select("embedding")
      .as[Seq[Float]].head().toArray
    val enc = emb.withColumn("codes", Quantization.pqEncode(pq)(col("embedding")))
      .cache()
    assert(enc.select("codes").head().getAs[Array[Byte]](0).length == 8)
    val exact = emb
      .withColumn("distance", Distances.euclidean(col("embedding"), lit(q)))
      .orderBy(col("distance").asc, col("vec_id").asc).limit(10)
    val approx = Quantization.pqSearchRerank(enc, pq, q, k = 10,
      idCol = "vec_id", vecCol = "embedding", oversample = 8)
    val r = graft.ann.Ivf.recallAtK(exact, approx, "vec_id")
    assert(r >= 0.8, s"PQ recall@10 = $r")
  }

  test("split two-phase: coarse scan reads ONLY (id, codes); fetch pushes id filter") {
    val sq = Quantization.trainSq(emb, col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("qsplit").toString
    emb.withColumn("codes", Quantization.sqEncode(sq)(col("embedding")))
      .select("vec_id", "codes").write.mode("overwrite").parquet(s"$dir/codes")
    emb.write.mode("overwrite").parquet(s"$dir/full")
    val codesDf = spark.read.parquet(s"$dir/codes")
    val fullDf = spark.read.parquet(s"$dir/full")
    val q = emb.filter(col("vec_id") === 1).select("embedding")
      .as[Seq[Float]].head().toArray

    // phase-1 plan: the narrow scan must not touch any f32 vector bytes
    val coarse = codesDf
      .select(col("vec_id"), Quantization.sqAsymmetricDist(sq, q)(col("codes")).as("__qd"))
      .orderBy(col("__qd").asc, col("vec_id").asc).limit(40)
    val coarsePlan = coarse.queryExecution.executedPlan.toString
    assert(coarsePlan.contains("ReadSchema: struct<vec_id:bigint,codes:binary>"),
      s"coarse scan reads more than (id, codes):\n$coarsePlan")

    val top = Quantization.sqSearchRerankSplit(codesDf, fullDf, sq, q, k = 10,
      idCol = "vec_id", vecCol = "embedding")
    // phase-2 plan: candidate id list pushed into the parquet scan
    assert(top.queryExecution.executedPlan.toString.contains("PushedFilters: [In(vec_id"),
      "candidate id filter not pushed to the full-table scan")
    // and the result matches exact search
    val exact = fullDf
      .withColumn("distance", Distances.euclidean(col("embedding"), lit(q)))
      .orderBy(col("distance").asc, col("vec_id").asc).limit(10)
    assert(graft.ann.Ivf.recallAtK(exact, top, "vec_id") >= 0.9)
  }

  test("batched BQ two-phase degenerates to exact per-query top-k") {
    import graft.ann.Ivf
    val bq = Quantization.trainBq(emb, col("embedding"))
    val base = emb.withColumn("codes",
      Quantization.bqEncodeLongs(bq)(col("embedding")))
    // long packing agrees with the byte packing bit for bit
    val row = base.withColumn("bytes",
      Quantization.bqEncode(bq)(col("embedding")))
      .select("codes", "bytes").head()
    val longs = row.getSeq[Long](0)
    val bytes = row.getAs[Array[Byte]](1)
    (0 until dims).foreach { i =>
      val fromLong = (longs(i >> 6) >>> (i & 63)) & 1L
      val fromByte = (bytes(i / 8) >> (i % 8)) & 1
      assert(fromLong == fromByte, s"bit $i")
    }
    val ix = Ivf.build(base, col("embedding"), numCells = 4)
    val queries = emb.filter(col("vec_id") < 5).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray).zipWithIndex.map(_.swap).toSeq
    // full probe + oversample spanning the corpus → the coarse pass keeps
    // every row, so the result IS the exact top-k
    val got = Quantization.batchBqSearchRerank(ix, bq, queries, k = 5,
      nprobe = 4, oversample = 100, idCol = "vec_id",
      vecCol = "embedding", roundTo = Some(6)).collect()
      .groupBy(_.getInt(0))
    queries.foreach { case (qid, qv) =>
      val exact = emb.withColumn("d",
          round(Distances.cosine(col("embedding"), lit(qv)), 6))
        .orderBy(col("d").asc, col("vec_id").asc).limit(5)
        .select(col("vec_id").cast("long"), col("d"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val mine = got(qid).map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(mine == exact, s"query $qid")
    }
    // pruned, modest oversample: recall stays high on this corpus
    val pruned = Quantization.batchBqSearchRerank(ix, bq, queries, k = 5,
      nprobe = 4, oversample = 8, idCol = "vec_id", vecCol = "embedding")
      .collect().groupBy(_.getInt(0))
    val recalls = queries.map { case (qid, qv) =>
      val exact = emb.withColumn("d",
          Distances.cosine(col("embedding"), lit(qv)))
        .orderBy(col("d").asc, col("vec_id").asc).limit(5)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
      val mine = pruned(qid).map(_.getLong(1)).toSet
      exact.intersect(mine).size / 5.0
    }
    assert(recalls.sum / recalls.length >= 0.6,
      s"BQ pre-rank recall collapsed: $recalls")
  }

  test("batched residual-BQ two-phase degenerates to exact top-k") {
    import graft.ann.{Ivf, Quantization}
    val ix0 = Ivf.build(emb, col("embedding"), numCells = 4)
    val withCodes = ix0.assigned.withColumn("codes",
      Quantization.residualBqEncodeLongs(ix0.centroids)(
        col("embedding"), col("cell")))
    val ix = ix0.copy(assigned = withCodes)
    val queries = emb.filter(col("vec_id") < 5).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray).zipWithIndex.map(_.swap).toSeq
    val got = Quantization.batchResidualBqSearchRerank(ix, queries, k = 5,
      nprobe = 4, oversample = 100, idCol = "vec_id",
      vecCol = "embedding", roundTo = Some(6)).collect()
      .groupBy(_.getInt(0))
    queries.foreach { case (qid, qv) =>
      val exact = emb.withColumn("d",
          round(Distances.cosine(col("embedding"), lit(qv)), 6))
        .orderBy(col("d").asc, col("vec_id").asc).limit(5)
        .select(col("vec_id").cast("long"), col("d"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val mine = got(qid).map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(mine == exact, s"query $qid")
    }
    // residual pre-rank at modest oversample keeps recall at least as
    // good as the global-bit form on the same corpus
    val pruned = Quantization.batchResidualBqSearchRerank(ix, queries,
      k = 5, nprobe = 4, oversample = 8, idCol = "vec_id",
      vecCol = "embedding").collect().groupBy(_.getInt(0))
    val recalls = queries.map { case (qid, qv) =>
      val exact = emb.withColumn("d",
          Distances.cosine(col("embedding"), lit(qv)))
        .orderBy(col("d").asc, col("vec_id").asc).limit(5)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
      val mine = pruned(qid).map(_.getLong(1)).toSet
      exact.intersect(mine).size / 5.0
    }
    assert(recalls.sum / recalls.length >= 0.6,
      s"residual BQ pre-rank recall collapsed: $recalls")
  }

  test("binary quantizer packs sign bits and ranks near-dups first") {
    val bq = Quantization.trainBq(emb, col("embedding"))
    assert(bq.dims == dims)
    val enc = emb.withColumn("codes", Quantization.bqEncode(bq)(col("embedding")))
    val bytes = enc.select("codes").head().getAs[Array[Byte]](0)
    assert(bytes.length == (dims + 7) / 8)
    // self-hamming = 0; two-phase search puts the query row first
    val q = emb.filter(col("vec_id") === 1).select("embedding")
      .as[Seq[Float]].head().toArray
    val top = Quantization.bqSearchRerank(enc, bq, q, k = 5,
      idCol = "vec_id", vecCol = "embedding")
      .select("vec_id").as[Long].collect()
    assert(top.head == 1L)
  }
}
