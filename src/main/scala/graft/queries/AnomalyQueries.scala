package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Anomaly

/** Oracle gate for Local Outlier Factor (reference: src/observe/
  * anomaly.rs:54-131): the full k-NN → k-distance → reachability → lrd →
  * LOF chain is relational, so DuckDB replays it exactly over the same
  * 200-vector slice (the exact all-pairs edge list is the documented
  * small-n oracle form; the blocked edge list is the scale path).
  */
object AnomalyQueries {

  val defs: Map[String, Q] = Map(
    "lof_outliers" -> Q(
      """WITH v AS (SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id < 200),
        |d AS (
        |  SELECT a.id AS src, b.id AS dst,
        |         list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS dist
        |  FROM v a JOIN v b ON a.id <> b.id
        |),
        |e AS (SELECT *, row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn FROM d),
        |knn AS (SELECT src, dst, dist FROM e WHERE rn <= 10),
        |kd AS (SELECT src AS id, max(dist) AS kdist FROM knn GROUP BY src),
        |reach AS (
        |  SELECT knn.src, knn.dst, greatest(knn.dist, kd.kdist) AS r
        |  FROM knn JOIN kd ON knn.dst = kd.id
        |),
        |lrd AS (SELECT src AS id, count(*) / sum(r) AS lrd FROM reach GROUP BY src),
        |lof AS (
        |  SELECT knn.src AS id, sum(l2.lrd) / (count(*) * max(l1.lrd)) AS lof
        |  FROM knn JOIN lrd l1 ON knn.src = l1.id JOIN lrd l2 ON knn.dst = l2.id
        |  GROUP BY knn.src
        |)
        |SELECT id, round(lof, 6) AS lof_score
        |FROM lof ORDER BY lof DESC, id LIMIT 20""".stripMargin
    ) { (s, dir) =>
      Anomaly.lof(
        Tables.load(s, dir, "embeddings").filter(col("vec_id") < 200)
          .select(col("vec_id"), col("embedding")),
        col("vec_id"), col("embedding"), k = 10)
        .select(col("id"), round(col("lof_score"), 6).as("lof_score"))
        .orderBy(col("lof_score").desc, col("id"))
        .limit(20)
    },

    // The SCALE path under the same oracle: IVF-blocked candidate edges
    // at full probe are provably the complete k-NN edge set, so
    // lofBlocked must hash-match the exact-LOF oracle row for row. The
    // driver gate therefore covers the path a 100 TB run would take,
    // not just the small-n definitional form.
    "lof_blocked_full_probe" -> Q(
      """WITH v AS (SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id < 200),
        |d AS (
        |  SELECT a.id AS src, b.id AS dst,
        |         list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS dist
        |  FROM v a JOIN v b ON a.id <> b.id
        |),
        |e AS (SELECT *, row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn FROM d),
        |knn AS (SELECT src, dst, dist FROM e WHERE rn <= 10),
        |kd AS (SELECT src AS id, max(dist) AS kdist FROM knn GROUP BY src),
        |reach AS (
        |  SELECT knn.src, knn.dst, greatest(knn.dist, kd.kdist) AS r
        |  FROM knn JOIN kd ON knn.dst = kd.id
        |),
        |lrd AS (SELECT src AS id, count(*) / sum(r) AS lrd FROM reach GROUP BY src),
        |lof AS (
        |  SELECT knn.src AS id, sum(l2.lrd) / (count(*) * max(l1.lrd)) AS lof
        |  FROM knn JOIN lrd l1 ON knn.src = l1.id JOIN lrd l2 ON knn.dst = l2.id
        |  GROUP BY knn.src
        |)
        |SELECT id, round(lof, 6) AS lof_score
        |FROM lof ORDER BY lof DESC, id LIMIT 20""".stripMargin
    ) { (s, dir) =>
      Anomaly.lofBlocked(
        Tables.load(s, dir, "embeddings").filter(col("vec_id") < 200)
          .select(col("vec_id"), col("embedding")),
        col("vec_id"), col("embedding"), k = 10,
        numCells = 8, nprobe = 8)
        .select(col("id"), round(col("lof_score"), 6).as("lof_score"))
        .orderBy(col("lof_score").desc, col("id"))
        .limit(20)
    },
  )
}
