package graft.queries

import org.apache.spark.sql.functions._

import graft.ann.{Ivf, Lsh}
import graft.core.Tables

/** ANN-mode queries (SURVEY.md §7.1 step 13). The full-probe IVF entry is
  * oracle-checked (nprobe = numCells is provably exact); the pruned-probe
  * and LSH entries are rows-only (KMeans / random planes are not
  * SQL-reproducible) and their recall is asserted in AnnSpec.
  */
object AnnQueries {

  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String): Array[Float] =
    Tables.load(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray

  /** One shared IVF index per (dir, cells) — an index is persistent
    * collection state, not a per-query artifact. The assigned frame is
    * pinned so repeat probes skip the re-assignment scan.
    */
  private def ivfIndex(s: org.apache.spark.sql.SparkSession, dir: String,
                       numCells: Int): Ivf.Index =
    graft.core.IndexCache.getOrBuild(s"ivf:$dir:$numCells") {
      val ix = Ivf.build(Tables.load(s, dir, "embeddings"),
        col("embedding"), numCells = numCells)
      ix.copy(assigned = ix.assigned.persist())
    }

  val defs: Map[String, Q] = Map(
    "ivf_knn_full_probe" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        |       round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |FROM embeddings, q
        |ORDER BY distance, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val ix = ivfIndex(s, dir, 8)
      Ivf.search(ix, queryVec(s, dir), k = 10, nprobe = 8,
        idCol = "vec_id", vecCol = "embedding", roundTo = Some(6))
        .select(col("vec_id"), col("label"), col("distance"))
    },

    "ivf_knn_pruned" -> Q.noOracle { (s, dir) =>
      val ix = ivfIndex(s, dir, 8)
      val q = queryVec(s, dir)
      val approx = Ivf.search(ix, q, k = 10, nprobe = 2,
        idCol = "vec_id", vecCol = "embedding", roundTo = Some(6))
        // scalar columns only: the driver's comparer can't hash array cells
        .select(col("vec_id"), col("label"), col("distance"))
      // self-check: the pruned probe must recall >= 0.5 of the exact top-10
      // (observed 0.6 on this data; the gate fails if pruning breaks)
      val exact = Tables.load(s, dir, "embeddings")
        .withColumn("d", graft.functions.Distances.cosine(col("embedding"), lit(q)))
        .orderBy(col("d").asc, col("vec_id").asc).limit(10)
        .select(col("vec_id"))
      val hits = approx.join(exact, "vec_id").agg(count(lit(1)).as("n_hit"))
      approx.crossJoin(broadcast(hits))
        .withColumn("check_passed", col("n_hit") >= 5).drop("n_hit")
    },

    // The pruned-probe MECHANICS under a full hash oracle: centroids are
    // pinned to the first 8 stored vectors (k-means is the one
    // non-SQL-reproducible piece, so pin it away), and DuckDB replays the
    // whole IVF pipeline — argmin cell assignment, nearest-2-cell probe
    // selection, exact top-k within the probed cells. `ivf_knn_pruned`
    // keeps the trained-centroid form with its recall self-check; this
    // gate proves the probe/prune algebra is row-for-row correct.
    "ivf_pruned_fixed" -> Q(
      """WITH cents AS (
        |  SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |v AS (SELECT vec_id, label, embedding::DOUBLE[] AS ve FROM embeddings),
        |assigned AS (
        |  SELECT v.vec_id, v.label, v.ve,
        |         (SELECT c.cell FROM cents c
        |          ORDER BY 1 - list_cosine_similarity(v.ve, c.cv), c.cell
        |          LIMIT 1) AS cell
        |  FROM v),
        |q AS (SELECT ve AS qv FROM v WHERE vec_id = 0),
        |probe AS (
        |  SELECT c.cell FROM cents c, q
        |  ORDER BY 1 - list_cosine_similarity(qv, c.cv), c.cell LIMIT 2)
        |SELECT a.vec_id, a.label,
        |       round(1 - list_cosine_similarity(a.ve, qv), 6) AS distance
        |FROM assigned a, q
        |WHERE a.cell IN (SELECT cell FROM probe)
        |ORDER BY distance, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val ix = graft.core.IndexCache.getOrBuild(s"ivffix:$dir") {
        val emb = Tables.load(s, dir, "embeddings")
        val cents = emb.filter(col("vec_id") < 8).orderBy("vec_id")
          .select("embedding").collect().map(_.getSeq[Float](0).toArray)
        Ivf.Index(cents,
          emb.withColumn("cell",
            Ivf.cellOf(col("embedding"), cents, "cosine")).persist(),
          "cosine")
      }
      Ivf.search(ix, queryVec(s, dir), k = 10, nprobe = 2,
        idCol = "vec_id", vecCol = "embedding", roundTo = Some(6))
        .select(col("vec_id"), col("label"), col("distance"))
    },

    // Storage round-trip under the exact-search oracle: the index is
    // written partitionBy(cell) (the inverted-file directory layout —
    // probe filters become storage-level PartitionFilters), loaded back,
    // and a full probe over the STORED cells must still reproduce the
    // brute-force top-k bit-for-bit.
    "ivf_stored_search" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        |       round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |FROM embeddings, q
        |ORDER BY distance, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val loaded = graft.core.IndexCache.getOrBuild(s"ivfstored:$dir") {
        val path = java.nio.file.Files
          .createTempDirectory("graft-ivf-stored").toString
        Ivf.writeIndex(ivfIndex(s, dir, 8), path)
        Ivf.loadIndex(s, path)
      }
      Ivf.search(loaded, queryVec(s, dir), k = 10, nprobe = 8,
        idCol = "vec_id", vecCol = "embedding", roundTo = Some(6))
        .select(col("vec_id"), col("label"), col("distance"))
    },

    // recall@10 of the pruned IVF search vs exact ground truth, surfaced
    // as a 1-row measurement (the reference's recall_benchmark.rs analogue).
    "ivf_recall" -> Q.noOracle { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val q = queryVec(s, dir)
      val ix = ivfIndex(s, dir, 8)
      val exact = emb
        .withColumn("distance",
          round(graft.functions.Distances.cosine(col("embedding"),
            org.apache.spark.sql.functions.lit(q)), 6))
        .orderBy(col("distance"), col("vec_id")).limit(10)
      val recalls = Seq(2, 4, 8).map { nprobe =>
        val approx = Ivf.search(ix, q, 10, nprobe, "vec_id", "embedding", Some(6))
        (nprobe, Ivf.recallAtK(exact, approx, "vec_id"))
      }
      recalls.toDF("nprobe", "recall_at_10")
        // self-check: recall floors per probe depth (observed 0.6/0.9/1.0);
        // nprobe = numCells is provably exact, so it must be ~1.0.
        // These floors are the honest ceiling for THIS table: the
        // synthetic embeddings are isotropic (measured r6: every cell
        // radius ≈ every centroid distance ≈ 1.0 after normalization, so
        // the triangle bound prunes 0 cells and partial probes lose
        // neighbors by construction). The ≥0.95 reference-parity band is
        // asserted on a clustered workload in `ivf_recall_clustered` and
        // measured at the reference's own 1M×384 shape in
        // bench_history/baseline_shape_r06.json (0.975 recall at 3.8%
        // scan, 673 QPS batched vs 36 QPS exact).
        .withColumn("check_passed", col("recall_at_10") >=
          when(col("nprobe") === 2, 0.4)
            .when(col("nprobe") === 4, 0.6).otherwise(0.99))
    },

    // IVF recall on a CLUSTERED corpus (the reference's published
    // 0.95-0.99 recall@10 band, docs/benchmarks.md:51-54, is measured on
    // clustered embedding data — real corpora cluster; isotropic noise is
    // the one distribution where cell pruning cannot work). Corpus: 50
    // centers from the embeddings table × 10 deterministic replicas
    // (xxhash64 noise, scale 0.05 ≪ inter-center distance). Floors: a
    // 2-of-16-cell probe (12.5% scan) must recall ≥ 0.95 — at the 1M
    // baseline shape the same config measures 673 QPS vs 36 QPS exact.
    "ivf_recall_clustered" -> Q.noOracle { (s, dir) =>
      import s.implicits._
      val corpus = graft.core.IndexCache.getOrBuild(s"ivfclu:$dir") {
        val c = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 50)
          .crossJoin(s.range(10).select(col("id").as("rep")))
          .select((col("vec_id") * 10 + col("rep")).as("id"),
            expr("""transform(embedding, (x, j) -> cast(
                   |  x + 0.05 * (pmod(xxhash64(vec_id * 10 + rep, j, 11), 1000000)/500000.0 - 1.0)
                   |as float))""".stripMargin).as("vector"))
          .persist()
        c.count(); c
      }
      val ix = graft.core.IndexCache.getOrBuild(s"ivfclu_ix:$dir") {
        val b = Ivf.build(corpus, col("vector"), numCells = 16)
        b.copy(assigned = b.assigned.persist())
      }
      val queries = corpus.filter(col("id") % 50 === 7).orderBy("id")
        .select("id", "vector").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).take(10)
      val recalls = Seq(2, 16).map { nprobe =>
        val rs = queries.map { case (qid, qv) =>
          val exact = corpus
            .withColumn("d", graft.functions.Distances.cosine(
              col("vector"), lit(qv)))
            .orderBy(col("d").asc, col("id").asc).limit(10).select("id")
          Ivf.recallAtK(exact,
            Ivf.search(ix, qv, 10, nprobe, "id", "vector"), "id")
        }
        (nprobe, math.rint(rs.sum / rs.length * 1000) / 1000)
      }
      recalls.toDF("nprobe", "mean_recall_at_10")
        .withColumn("check_passed", col("mean_recall_at_10") >=
          when(col("nprobe") === 2, 0.95).otherwise(0.99))
    },

    // recall@10 of the two-phase quantized searches (SQ8 asymmetric +
    // binary Hamming pre-rank, exact re-rank) vs exact ground truth —
    // the scan-bandwidth path for 100 TB (4× / 32× less IO).
    "quantized_recall" -> Q.noOracle { (s, dir) =>
      import s.implicits._
      import graft.ann.Quantization
      val emb = graft.core.IndexCache.getOrBuild(s"sq:$dir") {
        val e = Tables.load(s, dir, "embeddings")
        val sq = Quantization.trainSq(e, col("embedding"))
        val bq = Quantization.trainBq(e, col("embedding"))
        val pq = Quantization.trainPq(e, col("embedding"), numSubvectors = 8)
        val enc = e
          .withColumn("sq_codes", Quantization.sqEncode(sq)(col("embedding")))
          .withColumn("bq_codes", Quantization.bqEncode(bq)(col("embedding")))
          .withColumn("pq_codes", Quantization.pqEncode(pq)(col("embedding")))
          .persist()
        (sq, bq, pq, enc)
      }
      val (sq, bq, pq, enc) = emb
      val q = queryVec(s, dir)
      val exact = enc
        .withColumn("distance",
          graft.functions.Distances.euclidean(col("embedding"), lit(q)))
        .orderBy(col("distance").asc, col("vec_id").asc).limit(10)
      val sqTop = Quantization.sqSearchRerank(enc, sq, q, 10,
        idCol = "vec_id", vecCol = "embedding", codesCol = "sq_codes")
      val bqTop = Quantization.bqSearchRerank(enc, bq, q, 10,
        idCol = "vec_id", vecCol = "embedding", codesCol = "bq_codes",
        metric = "euclidean")
      val pqTop = Quantization.pqSearchRerank(enc, pq, q, 10,
        idCol = "vec_id", vecCol = "embedding", codesCol = "pq_codes",
        oversample = 8)
      Seq(
        ("sq8_rerank", Ivf.recallAtK(exact, sqTop, "vec_id")),
        ("pq_adc_rerank", Ivf.recallAtK(exact, pqTop, "vec_id")),
        ("binary_rerank", Ivf.recallAtK(exact, bqTop, "vec_id")))
        .toDF("scheme", "recall_at_10")
        // self-check: two-phase rerank recovers the exact top-10 almost
        // entirely (observed 1.0 for all three schemes on this data)
        .withColumn("check_passed", col("recall_at_10") >= 0.8)
    },

    // SQ8 two-phase search under a FULL hash oracle: training (per-dim
    // min/max) is a deterministic aggregate, and every float-arithmetic
    // step of encode → decode → f32-accumulated asymmetric distance is
    // replayed in DuckDB by wrapping each operation in CAST(... AS FLOAT)
    // (IEEE ops are correctly rounded, so double-compute-then-round-to-
    // f32 equals Java's f32 op exactly); the sequential f32 accumulation
    // uses list_reduce over dim-ordered terms. Gates the quantizer
    // training, the u8 codes, the coarse rank, and the exact re-rank.
    "sq8_two_phase_fixed" -> Q(
      """WITH unn AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |         unnest(embedding) AS x
        |  FROM embeddings
        |),
        |mm AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM unn GROUP BY dim),
        |sc AS (
        |  SELECT dim, mn,
        |         CASE WHEN CAST(mx - mn AS FLOAT) > CAST(1e-10 AS FLOAT)
        |              THEN CAST(CAST(255.0 AS FLOAT) / CAST(mx - mn AS FLOAT) AS FLOAT)
        |              ELSE CAST(1.0 AS FLOAT) END AS scale
        |  FROM mm
        |),
        |qv AS (
        |  SELECT generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS qx
        |  FROM embeddings WHERE vec_id = 0
        |),
        |codes AS (
        |  SELECT u.vec_id, u.dim,
        |         CAST(trunc(least(CAST(255.0 AS FLOAT), greatest(CAST(0.0 AS FLOAT),
        |           CAST(CAST(u.x - s.mn AS FLOAT) * s.scale AS FLOAT)))) AS INTEGER) AS code
        |  FROM unn u JOIN sc s USING (dim)
        |),
        |terms AS (
        |  SELECT c.vec_id,
        |         list(CAST(CAST(q.qx - CAST(CAST(CAST(c.code AS FLOAT) / s.scale AS FLOAT) + s.mn AS FLOAT) AS FLOAT)
        |              * CAST(q.qx - CAST(CAST(CAST(c.code AS FLOAT) / s.scale AS FLOAT) + s.mn AS FLOAT) AS FLOAT) AS FLOAT)
        |              ORDER BY c.dim) AS ds
        |  FROM codes c JOIN sc s USING (dim) JOIN qv q USING (dim)
        |  GROUP BY c.vec_id
        |),
        |qd AS (
        |  SELECT vec_id,
        |         CAST(CAST(sqrt(CAST(list_reduce(ds, (a, b) -> CAST(a + b AS FLOAT)) AS DOUBLE)) AS FLOAT) AS DOUBLE) AS qdist
        |  FROM terms
        |),
        |coarse AS (SELECT vec_id FROM qd ORDER BY qdist, vec_id LIMIT 40),
        |q2 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |       round(list_distance(e.embedding::DOUBLE[], q2.qe::DOUBLE[]), 6) AS distance
        |FROM embeddings e JOIN coarse USING (vec_id), q2
        |ORDER BY distance, e.vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      import graft.ann.Quantization
      val (sq, _, _, enc) = graft.core.IndexCache
        .getOrBuild(s"sq:$dir") {
          val e = Tables.load(s, dir, "embeddings")
          val sqT = Quantization.trainSq(e, col("embedding"))
          val bqT = Quantization.trainBq(e, col("embedding"))
          val pqT = Quantization.trainPq(e, col("embedding"), numSubvectors = 8)
          val encD = e
            .withColumn("sq_codes", Quantization.sqEncode(sqT)(col("embedding")))
            .withColumn("bq_codes", Quantization.bqEncode(bqT)(col("embedding")))
            .withColumn("pq_codes", Quantization.pqEncode(pqT)(col("embedding")))
            .persist()
          (sqT, bqT, pqT, encD)
        }
      Quantization.sqSearchRerank(enc, sq, queryVec(s, dir), 10,
          idCol = "vec_id", vecCol = "embedding", codesCol = "sq_codes",
          roundTo = Some(6))
        .select(col("vec_id"), col("distance"))
    },

    // PCA embedding compression (reference: ml/dimreduce.rs) — rows-only
    // (power iteration is not SQL-reproducible). One row per component
    // with its variance ratio; the self-check asserts the spectral
    // contract: orthonormal components, ratios descending in [0,1].
    "pca_components" -> Q.noOracle { (s, dir) =>
      import s.implicits._
      import graft.ann.DimReduce
      val pca = DimReduce.fitPca(Tables.load(s, dir, "embeddings"),
        col("embedding"), nComponents = 8)
      def dot(a: Array[Float], b: Array[Float]): Double =
        a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val orthonormal = (0 until pca.nComponents).forall { i =>
        math.abs(dot(pca.components(i), pca.components(i)) - 1.0) < 1e-3 &&
          (0 until i).forall(j =>
            math.abs(dot(pca.components(i), pca.components(j))) < 1e-3)
      }
      val ratios = pca.explainedVarianceRatio
      val descending = ratios.sliding(2).forall(p => p.length < 2 || p(0) >= p(1) - 1e-6)
      val bounded = ratios.forall(r => r >= 0 && r <= 1.0001) && ratios.sum <= 1.0001
      // quantitative floor: the top-8 of 64 sorted ratios are >= 8/64 by
      // construction, so demand 10% ABOVE that uniform-spectrum baseline —
      // power iteration must actually find high-variance directions
      // (exact eigen sums: 0.205 at sf0.01, 0.160 at sf0.1)
      val dims = pca.components(0).length
      val informative =
        ratios.sum >= 1.1 * pca.nComponents.toDouble / dims
      ratios.zipWithIndex.map { case (r, i) =>
        (i, BigDecimal(r.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          orthonormal && descending && bounded && informative)
      }.toSeq.toDF("component", "variance_ratio", "check_passed")
        .orderBy(col("component"))
    },

    // Sign-LSH ANN — full hash oracle since r5: the hyperplanes are
    // seeded constants from the SAME Lsh.planes family, embedded in the
    // SQL as exact double literals (f32→f64 is exact, BigDecimal
    // round-trips the text), so the oracle reproduces every table's
    // bucket bits, the query's buckets, the candidate union, and the
    // rounded cosine top-k. Both engines accumulate dots in f64; a sign
    // flip would need |dot| ~ 1e-13 against unit-ish gaussian planes.
    "lsh_ann" -> Q({
      val tablesSql = (0 until 12).map { t =>
        val ps = Lsh.planes(64, 4, 42L + t)
        val cases = ps.zipWithIndex.map { case (p, i) =>
          val lit = p.map(f => new java.math.BigDecimal(f.toDouble).toPlainString)
            .mkString("[", ", ", "]")
          s"CASE WHEN list_dot_product(ve, $lit) > 0 THEN ${1L << i} ELSE 0 END"
        }.mkString(" + ")
        s"($cases)"
      }.mkString("[", ",\n         ", "]")
      s"""WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
        |b AS (
        |  SELECT vec_id, ve,
        |         $tablesSql AS bks
        |  FROM v),
        |q AS (SELECT bks AS qbks, ve AS qv FROM b WHERE vec_id = 0)
        |SELECT vec_id,
        |       round(1 - list_cosine_similarity(ve, qv), 6) AS distance
        |FROM b, q
        |WHERE len(list_filter(range(1, 13), t -> bks[t] = qbks[t])) > 0
        |ORDER BY distance, vec_id LIMIT 10""".stripMargin
    }) { (s, dir) =>
      val q = queryVec(s, dir)
      Lsh.search(Tables.load(s, dir, "embeddings"), "vec_id",
          "embedding", q, k = 10, dims = 64, numTables = 12, numPlanes = 4,
          roundTo = Some(6))
        .select(col("vec_id"), col("distance"))
    },

    // Data profiling + smart index selection (tuning.rs:1122-1445): the
    // moment statistics run as one distributed fixed-point aggregation
    // over the whole corpus, and the index selection is a deterministic
    // rule over (n, dim) — both DuckDB-replicated, so this is a full hash
    // oracle. The sampled pairwise estimators (intrinsic dimensionality,
    // cluster count, mean pairwise distance) are driver-side loops over a
    // bounded sample and stay covered by DataProfilerSpec instead.
    "data_profile" -> Q(
      """WITH per AS (
        |  SELECT len(embedding) AS dim,
        |         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS mag,
        |         list_sum(list_transform(embedding::DOUBLE[],
        |           x -> CASE WHEN abs(x) < 0.001 THEN 1 ELSE 0 END)) AS nz
        |  FROM embeddings),
        |agg AS (
        |  SELECT count(*) AS n, max(dim) AS dim,
        |         sum(CAST(round(mag * 1000000) AS BIGINT)) AS s1,
        |         sum(CAST(round(mag * mag * 1000000) AS BIGINT)) AS s2,
        |         sum(nz) AS nz, sum(dim) AS total_vals
        |  FROM per),
        |m AS (
        |  SELECT n, dim,
        |         s1 / (n * 1000000.0) AS mean_mag,
        |         sqrt(greatest(s2 / (n * 1000000.0)
        |           - (s1 / (n * 1000000.0)) * (s1 / (n * 1000000.0)), 0)) AS std_mag,
        |         nz * 1.0 / greatest(total_vals, 1) AS sparsity
        |  FROM agg)
        |SELECT CAST(dim AS BIGINT) AS dimensions, n AS n_vectors,
        |  round(mean_mag, 6) AS mean_magnitude,
        |  round(std_mag, 6) AS std_magnitude,
        |  round(sparsity, 6) AS sparsity_ratio,
        |  CAST(CASE WHEN abs(mean_mag - 1.0) < 0.1 AND std_mag < 0.1
        |       THEN 1 ELSE 0 END AS BIGINT) AS appears_normalized,
        |  CASE WHEN n * 10 < 100000 THEN 'exact'
        |       WHEN n * 10 * dim * 4 <= 17179869184 THEN 'ivf'
        |       ELSE 'ivf+sq8' END AS recommended_index
        |FROM m""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val sel = graft.ann.SmartIndexSelector.select(emb, col("embedding"))
      val p = sel.profile
      Seq((p.dimensions.toLong, p.sampleSize, p.meanMagnitude, p.stdMagnitude,
        p.sparsityRatio, if (p.appearsNormalized) 1L else 0L, sel.recommended))
        .toDF("dimensions", "n_vectors", "mean_magnitude", "std_magnitude",
          "sparsity_ratio", "appears_normalized", "recommended_index")
        .select(col("dimensions"), col("n_vectors"),
          round(col("mean_magnitude"), 6).as("mean_magnitude"),
          round(col("std_magnitude"), 6).as("std_magnitude"),
          round(col("sparsity_ratio"), 6).as("sparsity_ratio"),
          col("appears_normalized"), col("recommended_index"))
    },
  )
}
