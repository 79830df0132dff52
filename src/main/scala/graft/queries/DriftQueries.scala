package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Drift

/** Oracle gates for embedding drift detection (reference:
  * src/observe/drift.rs). Baseline = vec_id < 250; the "production
  * window" = the remaining vectors with a synthetic affine shift
  * (x·1.2 + 0.05), so centroid, variance, and per-dimension statistics
  * all genuinely move.
  */
object DriftQueries {

  private val setsCte =
    """base AS (SELECT embedding FROM embeddings WHERE vec_id < 250),
      |cur AS (
      |  SELECT list_transform(embedding,
      |           x -> (x::DOUBLE * 1.2::DOUBLE + 0.05::DOUBLE)::FLOAT) AS embedding
      |  FROM embeddings WHERE vec_id >= 250
      |)""".stripMargin

  private def sets(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val emb = Tables.load(s, dir, "embeddings")
    val base = emb.filter(col("vec_id") < 250).select("embedding")
    // double arithmetic then one f32 truncation — matches the oracle's
    // (x * 1.2 + 0.05)::FLOAT exactly (per-step f32 rounding would not)
    val cur = emb.filter(col("vec_id") >= 250)
      .select(transform(col("embedding"),
        x => (x.cast("double") * 1.2 + 0.05).cast("float")).as("embedding"))
    (base, cur)
  }

  val defs: Map[String, Q] = Map(
    // Per-dimension drift (drift.rs:485-521): |mean shift|, variance
    // ratio, (normalized_shift + |ratio−1|)/2 — top 10 drifting dims.
    "drift_dimensions" -> Q(
      s"""WITH $setsCte,
        |be AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |              unnest(embedding)::DOUBLE AS x FROM base),
        |ce AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |              unnest(embedding)::DOUBLE AS x FROM cur),
        |b AS (SELECT dim, avg(x) AS m, var_samp(x) AS v, min(x) AS mn, max(x) AS mx
        |      FROM be GROUP BY dim),
        |c AS (SELECT dim, avg(x) AS m, var_samp(x) AS v FROM ce GROUP BY dim),
        |d AS (
        |  SELECT b.dim, abs(c.m - b.m) AS mean_shift,
        |         CASE WHEN b.v > 0 THEN c.v / b.v ELSE 1.0 END AS variance_ratio,
        |         CASE WHEN b.mx - b.mn > 0 THEN abs(c.m - b.m) / (b.mx - b.mn)
        |              ELSE abs(c.m - b.m) END AS ns
        |  FROM b JOIN c ON b.dim = c.dim
        |)
        |SELECT dim, round(mean_shift, 6) AS mean_shift,
        |       round(variance_ratio, 6) AS variance_ratio,
        |       round((ns + abs(variance_ratio - 1.0)) / 2.0, 6) AS drift_score
        |FROM d ORDER BY (ns + abs(variance_ratio - 1.0)) / 2.0 DESC, dim
        |LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val (base, cur) = sets(s, dir)
      Drift.dimensionDrift(base, cur, col("embedding"))
        .select(col("dim"), round(col("mean_shift"), 6).as("mean_shift"),
          round(col("variance_ratio"), 6).as("variance_ratio"),
          round(col("drift_score"), 6).as("drift_score"))
        .orderBy(col("drift_score").desc, col("dim"))
        .limit(10)
    },

    // Whole-window report (drift.rs:352-445) without the KS leg (the
    // pointer-walk statistic is not SQL-expressible; spec-covered):
    // centroid cosine shift, total variance ratio, weighted score,
    // threshold disjunction.
    "drift_report" -> Q(
      s"""WITH $setsCte,
        |be AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |              unnest(embedding)::DOUBLE AS x FROM base),
        |ce AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |              unnest(embedding)::DOUBLE AS x FROM cur),
        |b AS (SELECT dim, avg(x) AS m, var_samp(x) AS v FROM be GROUP BY dim),
        |c AS (SELECT dim, avg(x) AS m, var_samp(x) AS v FROM ce GROUP BY dim),
        |agg AS (
        |  SELECT sum(b.m * c.m) AS dot, sqrt(sum(b.m * b.m)) AS mb,
        |         sqrt(sum(c.m * c.m)) AS mc, sum(b.v) AS bv, sum(c.v) AS cv
        |  FROM b JOIN c ON b.dim = c.dim
        |),
        |r AS (
        |  SELECT CASE WHEN mb = 0 OR mc = 0 THEN 1.0
        |              ELSE 1.0 - least(greatest(dot / (mb * mc), -1.0), 1.0) END AS cs,
        |         CASE WHEN bv = 0 THEN 1.0 ELSE cv / bv END AS vr
        |  FROM agg
        |)
        |SELECT round(cs, 6) AS centroid_shift, round(vr, 6) AS variance_ratio,
        |       round(least(cs / 0.1, 1.0) * 0.4 +
        |             least(abs(vr - 1.0) / 0.2, 1.0) * 0.3, 6) AS drift_score,
        |       CAST(CASE WHEN cs > 0.1 OR vr > 1.2 OR vr < 0.8 THEN 1 ELSE 0 END AS BIGINT) AS is_drifting
        |FROM r""".stripMargin
    ) { (s, dir) =>
      val (base, cur) = sets(s, dir)
      Drift.report(base, cur, col("embedding"), includeKs = false)
        .select(round(col("centroid_shift"), 6).as("centroid_shift"),
          round(col("variance_ratio"), 6).as("variance_ratio"),
          round(col("drift_score"), 6).as("drift_score"),
          col("is_drifting").cast("long").as("is_drifting"))
    },
  )
}
