package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.VectorAnalytics

/** Vector-aggregation queries (SURVEY.md §2.6) over `embeddings`.
  * The DuckDB oracle rebuilds the f32-truncated centroid per group with
  * unnest/generate_subscripts and list aggregation, mirroring the
  * reference's f64-accumulate-then-f32-truncate semantics.
  */
object VectorAggQueries {

  /** Shared oracle CTEs: per-label f32 centroid + per-vector distance. */
  private val centroidByLabel =
    """unn AS (
      |  SELECT label, vec_id, generate_subscripts(embedding, 1) AS dim,
      |         unnest(embedding)::DOUBLE AS x
      |  FROM embeddings
      |),
      |cent AS (SELECT label, dim, avg(x)::FLOAT AS v FROM unn GROUP BY label, dim),
      |cvec AS (SELECT label, list(v ORDER BY dim) AS c FROM cent GROUP BY label)""".stripMargin

  private val globalDistances =
    """unn AS (
      |  SELECT generate_subscripts(embedding, 1) AS dim, unnest(embedding)::DOUBLE AS x
      |  FROM embeddings
      |),
      |cent AS (SELECT dim, avg(x)::FLOAT AS v FROM unn GROUP BY dim),
      |cvec AS (SELECT list(v ORDER BY dim) AS c FROM cent),
      |d AS (SELECT e.vec_id, list_distance(e.embedding::DOUBLE[], c.c::DOUBLE[]) AS dist
      |      FROM embeddings e, cvec c)""".stripMargin

  val defs: Map[String, Q] = Map(
    // Centroid per label (reference: vector_aggregation.rs:91-116).
    "vec_centroid" -> Q(
      s"""WITH $centroidByLabel
         |SELECT label, dim - 1 AS dim, round(v::DOUBLE, 6) AS value
         |FROM cent ORDER BY label, dim""".stripMargin
    ) { (s, dir) =>
      VectorAnalytics.centroid(Tables.load(s, dir, "embeddings"),
        col("embedding"), Seq(col("label")))
        .select(col("label"), col("dim"),
          // widen f32 -> f64 BEFORE rounding: round() on FloatType keeps
          // float32, whose double widening is not the decimal value
          round(col("value").cast("double"), 6).as("value"))
        .orderBy(col("label"), col("dim"))
    },

    // Medoid of the label-0 group (reference: vector_aggregation.rs:117-162).
    "vec_medoid" -> Q(
      """WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE label = 0)
        |SELECT a.vec_id,
        |       round(sum(list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[])), 4) AS total_dist
        |FROM sub a JOIN sub b ON a.vec_id <> b.vec_id
        |GROUP BY a.vec_id
        |ORDER BY total_dist, a.vec_id
        |LIMIT 1""".stripMargin
    ) { (s, dir) =>
      VectorAnalytics.medoid(
        Tables.load(s, dir, "embeddings").filter(col("label") === 0),
        col("vec_id"), col("embedding"), "euclidean")
        .select(col("id").as("vec_id"), round(col("total_dist"), 4).as("total_dist"))
    },

    // Spread = mean squared distance to the group centroid
    // (reference: vector_aggregation.rs:163-185).
    "vec_spread" -> Q(
      s"""WITH $centroidByLabel,
         |d AS (SELECT e.label, list_distance(e.embedding::DOUBLE[], c.c::DOUBLE[]) AS dist
         |      FROM embeddings e JOIN cvec c USING (label))
         |SELECT label, round(avg(dist * dist), 6) AS spread,
         |       round(sqrt(avg(dist * dist)), 6) AS std_dev
         |FROM d GROUP BY label ORDER BY label""".stripMargin
    ) { (s, dir) =>
      VectorAnalytics.spread(Tables.load(s, dir, "embeddings"),
        col("embedding"), Seq("label"), "euclidean")
        .select(col("label"), round(col("spread"), 6).as("spread"),
          round(col("std_dev"), 6).as("std_dev"))
        .orderBy(col("label"))
    },

    // Z-score outliers vs the global centroid
    // (reference: vector_aggregation.rs:381-425), threshold 1.5.
    "vec_outliers" -> Q(
      s"""WITH $globalDistances,
         |st AS (SELECT avg(dist) AS m,
         |              sqrt(avg(dist * dist) - avg(dist) * avg(dist)) AS s,
         |              count(*) AS n FROM d)
         |SELECT d.vec_id, round(d.dist, 6) AS distance,
         |       round((d.dist - st.m) / st.s, 6) AS z_score
         |FROM d, st
         |WHERE st.n > 2 AND st.s >= 1e-10 AND (d.dist - st.m) / st.s > 1.5
         |ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      VectorAnalytics.outliers(Tables.load(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), threshold = 1.5)
        .select(col("id").as("vec_id"), round(col("distance"), 6).as("distance"),
          round(col("z_score"), 6).as("z_score"))
        .orderBy(col("vec_id"))
    },

    // Distance-to-centroid histogram, 10 bins
    // (reference: vector_aggregation.rs:296-370).
    "vec_distribution" -> Q(
      s"""WITH $globalDistances,
         |st AS (SELECT min(dist) AS mn, max(dist) AS mx FROM d),
         |b AS (SELECT least(floor((d.dist - st.mn) /
         |               (CASE WHEN abs(st.mx - st.mn) < 1e-10 THEN 1.0
         |                     ELSE (st.mx - st.mn) / 10 END)), 9)::INT AS bin
         |      FROM d, st)
         |SELECT bin, count(*) AS bin_count FROM b GROUP BY bin ORDER BY bin""".stripMargin
    ) { (s, dir) =>
      VectorAnalytics.distribution(Tables.load(s, dir, "embeddings"),
        col("embedding"), bins = 10)
        .orderBy(col("bin"))
    },

    // Cluster{k} under a FULL hash oracle via pinned centroids (the
    // semantic_dedup_fixed trick — trained k-means++ is not
    // SQL-replayable, a fixed centroid set is): DuckDB replays ONE Lloyd
    // assignment step — nearest-centroid assignment (ties to the lowest
    // cell), per-cluster size, and per-cluster WCSS. Per-row squared
    // distances are rounded to 6 decimals BEFORE the sum so the hashed
    // aggregate is order-independent; the outer round(…, 3) absorbs the
    // summation-order ulp. The trained-path self-check (`vec_cluster`)
    // stays beside this gate.
    "vec_cluster_fixed" -> Q(
      """WITH cents AS (
        |  SELECT vec_id AS cluster, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE vec_id < 10),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
        |ad AS (
        |  SELECT v.vec_id, c.cluster, list_distance(v.ve, c.cv) AS d,
        |         row_number() OVER (PARTITION BY v.vec_id
        |             ORDER BY list_distance(v.ve, c.cv), c.cluster) AS rk
        |  FROM v CROSS JOIN cents c),
        |a AS (SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, d
        |      FROM ad WHERE rk = 1)
        |SELECT cluster, count(*) AS n,
        |       round(sum(round(d * d, 6)), 3) AS wcss
        |FROM a GROUP BY cluster ORDER BY cluster""".stripMargin
    ) { (s, dir) =>
      import graft.functions.Distances
      val emb = Tables.load(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < 10).orderBy("vec_id")
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray)
      // same struct-array argmin the IVF assignment uses (Ivf.cellOf),
      // kept inline to also surface the winning distance for the WCSS
      val scored = array(cents.zipWithIndex.map { case (c, i) =>
        struct(Distances.distance("euclidean", col("embedding"), lit(c)).as("d"),
          lit(i.toLong).as("cluster"))
      }: _*)
      emb.select(array_min(scored).as("best"))
        .select(col("best.cluster").as("cluster"), col("best.d").as("d"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("d") * col("d"), 6)), 3).as("wcss"))
        .orderBy("cluster")
    },

    // KMeans cluster sizes (reference Cluster{k}: vector_aggregation.rs:
    // 186-295) — rows-only: k-means++ init is not SQL-reproducible.
    "vec_cluster" -> Q.noOracle { (s, dir) =>
      val (assigned, wcss) = VectorAnalytics.clusterTrace(
        Tables.load(s, dir, "embeddings"),
        col("vec_id"), col("embedding"), k = 10)
      val sizes = assigned
        .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      // Lloyd's invariant: per-iteration WCSS never increases, and the
      // clustering actually converged (final < first — 10 planted label
      // clusters must beat the k-means++ start)
      val wcssMonotone = wcss.sliding(2)
        .forall(p => p.length < 2 || p(1) <= p(0) + 1e-6)
      val wcssImproved = wcss.length < 2 || wcss.last < wcss.head
      // self-check: a partition of the input — cluster ids within [0, k),
      // sizes positive, and the sizes sum back to the row count
      val total = Tables.load(s, dir, "embeddings")
        .agg(count(lit(1)).as("n_rows"))
      val sums = sizes.agg(sum(col("n")).as("n_assigned"))
      sizes.crossJoin(broadcast(total)).crossJoin(broadcast(sums))
        .withColumn("check_passed",
          col("cluster").between(0, 9) && col("n") > 0 &&
            col("n_assigned") === col("n_rows") &&
            lit(wcssMonotone) && lit(wcssImproved))
        .drop("n_rows", "n_assigned")
        .orderBy(col("cluster"))
    },
  )
}
