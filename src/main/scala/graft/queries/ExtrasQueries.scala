package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Extras

/** Oracle-checked gates for the Extras surface (SURVEY §2.5/§2.6 rows that
  * previously had ScalaTest-only evidence): field statistics, ensemble
  * (weighted-RRF) rerank, provenance tagging.
  */
object ExtrasQueries {

  /** Pinned ALS factors for `cf_recommend_fixed`: implicit-ALS (rank 4)
    * fitted offline on the SAME events-derived interaction matrix the
    * trained `cf_recommend` entry uses, then FROZEN here quantized to
    * multiples of 2⁻¹⁰. The quantization makes every factor product exact
    * in BOTH f32 and f64 (≤22-bit mantissas), so the recommend dot
    * product is bit-identical between Spark's float arrays and the
    * oracle's decimal literals — no rounding semantics participate.
    */
  private val cfU0Str = "-1.0673828125 0.515625 2.7275390625 -2.98828125"
  private val cfItemStrs: Seq[(String, String)] = Seq(
    "i0" -> "-0.060546875 0.029296875 0.154296875 -0.16796875",
    "i1" -> "-0.060546875 0.029296875 0.154296875 -0.1689453125",
    "i2" -> "-0.060546875 0.029296875 0.154296875 -0.1689453125",
    "i3" -> "-0.060546875 0.029296875 0.154296875 -0.16796875",
    "i4" -> "-0.060546875 0.029296875 0.154296875 -0.16796875",
    "i5" -> "0.12890625 -0.1865234375 0.03515625 -0.046875",
    "i6" -> "0.12890625 -0.1865234375 0.03515625 -0.046875",
    "i7" -> "0.12890625 -0.1865234375 0.03515625 -0.046875",
    "i8" -> "0.12890625 -0.1865234375 0.03515625 -0.046875",
    "i9" -> "0.12890625 -0.1865234375 0.03515625 -0.046875")

  private def cfFixedSql: String = {
    val u = cfU0Str.split(" ")
    val itemRows = cfItemStrs.map { case (it, fs) =>
      val g = fs.split(" ")
      s"('$it', ${g.mkString(", ")})"
    }.mkString(",\n      ")
    val dot = u.indices
      .map(i => s"CAST(g${i + 1} AS DOUBLE) * CAST(${u(i)} AS DOUBLE)")
      .mkString(" + ")
    s"""WITH itf(item, g1, g2, g3, g4) AS (VALUES
       |      $itemRows),
       |scored AS (SELECT item, $dot AS cf_score FROM itf)
       |SELECT item, round(cf_score, 6) AS cf_score
       |FROM scored WHERE item NOT IN ('i0', 'i1')
       |ORDER BY cf_score DESC, item LIMIT 5""".stripMargin
  }

  val defs: Map[String, Q] = Map(
    // CF recommendation under a FULL hash oracle via pinned factors (the
    // pinned-parameter replay trick): the ALS factorization is not
    // SQL-reproducible, a frozen factor matrix is. The Spark side routes
    // through the REAL CollaborativeFiltering.recommend path — pinned
    // Model, dot-product scoring, seen-item exclusion, (score desc, item)
    // ordering with real ties — and DuckDB replays the same dot products
    // as exact arithmetic. The trained-path self-check (`cf_recommend`)
    // stays beside this gate.
    "cf_recommend_fixed" -> Q(cfFixedSql) { (s, dir) =>
      import s.implicits._
      import graft.ops.CollaborativeFiltering
      val uf = Seq(("u0", cfU0Str.split(" ").map(_.toFloat).toSeq))
        .toDF("user", "features")
      val itf = cfItemStrs
        .map { case (it, fs) => (it, fs.split(" ").map(_.toFloat).toSeq) }
        .toDF("item", "features")
      CollaborativeFiltering.recommend(
        CollaborativeFiltering.Model(uf, itf, rank = 4), "u0", k = 5,
        seen = Seq("i0", "i1"))
        .select(col("item"), round(col("cf_score"), 6).as("cf_score"))
    },
    // Field statistics (reference metadata.rs:606-640). The approximate
    // cardinality (HLL) is not SQL-reproducible, so the gate projects the
    // exact columns only; the approx path is spec-covered (ExtrasSpec).
    // All columns are non-nullable BIGINT/VARCHAR (the boolean flag is
    // cast to 0/1 and the null-count coalesced) so the driver's value
    // hash sees identical physical representations on both sides.
    "field_stats" -> Q(
      """SELECT * FROM (
        |  SELECT 'event_type' AS field, count(DISTINCT event_type) AS cardinality,
        |         CAST(coalesce(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS nulls,
        |         count(*) AS total,
        |         CAST(CASE WHEN count(DISTINCT event_type) > 100 THEN 1 ELSE 0 END AS BIGINT) AS high_cardinality
        |  FROM events
        |  UNION ALL
        |  SELECT 'user_id', count(DISTINCT user_id),
        |         CAST(coalesce(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT), count(*),
        |         CAST(CASE WHEN count(DISTINCT user_id) > 100 THEN 1 ELSE 0 END AS BIGINT)
        |  FROM events)
        |ORDER BY field""".stripMargin
    ) { (s, dir) =>
      Extras.fieldStats(Tables.load(s, dir, "events"),
        Seq("event_type", "user_id"), cardinalityThreshold = 100)
        .select(col("field"), col("cardinality"),
          coalesce(col("nulls"), lit(0L)).as("nulls"), col("total"),
          col("high_cardinality").cast("long").as("high_cardinality"))
        .orderBy(col("field"))
    },

    // Ensemble rerank = weighted RRF over member ranked lists (reference:
    // reranker.rs ensemble; hybrid.rs RRF weights) — members are a cosine
    // top-20 and a reversed-vector top-20 at weights 0.7/0.3.
    "ensemble_rerank" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |a AS (SELECT vec_id::VARCHAR AS id,
        |             list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]) AS score
        |      FROM embeddings, q ORDER BY score DESC, id LIMIT 20),
        |b AS (SELECT vec_id::VARCHAR AS id,
        |             list_cosine_similarity(list_reverse(embedding)::DOUBLE[], qv::DOUBLE[]) AS score
        |      FROM embeddings, q ORDER BY score DESC, id LIMIT 20),
        |ra AS (SELECT id, 0.7 / (60 + row_number() OVER (ORDER BY score DESC, id)) AS ca FROM a),
        |rb AS (SELECT id, 0.3 / (60 + row_number() OVER (ORDER BY score DESC, id)) AS cb FROM b),
        |f AS (SELECT coalesce(ra.id, rb.id) AS id,
        |             coalesce(ca, 0) + coalesce(cb, 0) AS raw
        |      FROM ra FULL OUTER JOIN rb ON ra.id = rb.id)
        |SELECT id, round(raw, 6) AS rrf_score FROM f
        |ORDER BY raw DESC, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      import graft.functions.Distances
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      def member(vec: org.apache.spark.sql.Column) = emb
        .select(col("vec_id").cast("string").as("id"),
          (lit(1.0) - Distances.cosine(vec, lit(q))).as("score"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(20)
      Extras.ensembleRerank(
        Seq((member(col("embedding")), 0.7),
          (member(reverse(col("embedding"))), 0.3)), k = 10)
        .select(col("id"), round(col("rrf_score"), 6).as("rrf_score"))
    },

    // Collaborative filtering (reference experimental/collaborative_
    // filtering.rs): implicit-ALS over interactions derived
    // deterministically from events with two disjoint taste groups
    // (user_id parity). Rows-only (factorization is not SQL); the
    // self-check asserts a group-0 user's recommendations stay within
    // group-0 items — the factors actually separated the blocks.
    "cf_recommend" -> Q.noOracle { (s, dir) =>
      import graft.ops.CollaborativeFiltering
      val ev = Tables.load(s, dir, "events").filter(col("event_id") < 2000)
      val inter = ev.select(
        concat(lit("u"), col("user_id") % 20).as("user"),
        concat(lit("i"),
          (col("user_id") % 2) * 5 + col("event_id") % 5).as("item"),
        lit(1.0).as("w"))
      // a factorization is persistent collection state like the BM25/IVF
      // indexes — fit once per source dir, not per query execution
      val m = graft.core.IndexCache.getOrBuild(s"cf:$dir") {
        CollaborativeFiltering.fit(inter, "user", "item", "w",
          rank = 4, maxIter = 8)
      }
      // leave-one-out hit: refit with u0's i2 interactions removed; among
      // u0's unseen items the held-out i2 must rank first (its taste
      // group still co-prefers it) — hit-rate 1.0 on the planted block
      val holdoutHit = graft.core.IndexCache.getOrBuild(s"cf_holdout:$dir") {
        val m2 = CollaborativeFiltering.fit(
          inter.filter(!(col("user") === "u0" && col("item") === "i2")),
          "user", "item", "w", rank = 4, maxIter = 8)
        CollaborativeFiltering.recommend(m2, "u0", k = 1,
            seen = Seq("i0", "i1", "i3", "i4"))
          .select("item").collect().headOption.exists(_.getString(0) == "i2")
      }
      CollaborativeFiltering.recommend(m, "u0", k = 3)
        .select(col("item"),
          round(col("cf_score"), 6).as("cf_score"),
          (col("item").isin("i0", "i1", "i2", "i3", "i4") &&
            lit(holdoutHit)).as("check_passed"))
    },

    // Provenance tagging (reference insert.rs:446-460): struct flattened
    // to scalars for the hashable gate.
    "provenance_tag" -> Q(
      """SELECT doc_id, 'crawl-2026' AS source, 1700000000 AS created_at,
        |       '1' AS version
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Extras.withProvenance(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 50),
        source = "crawl-2026", createdAt = 1700000000L)
        .select(col("doc_id"), col("provenance.source").as("source"),
          col("provenance.created_at").as("created_at"),
          col("provenance.version").as("version"))
        .orderBy(col("doc_id"))
    },
  )
}
