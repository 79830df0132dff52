package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{RelevanceFeedback, Temporal}

/** Oracle gates for temporal vector sequences (reference:
  * src/experimental/temporal_sequences.rs) and closed-loop relevance
  * feedback (reference: src/experimental/relevance_feedback.rs).
  *
  * Sequences are derived from `embeddings`: seq = vec_id % 8, ts = vec_id
  * — 8 trajectories of ~62 ordered entries each at sf0.01. Feedback events
  * are derived from `events` with deterministic synthetic timestamps
  * (epoch arithmetic on event_id) so the decay math is wall-clock-free.
  */
object TemporalQueries {

  private val seqCte =
    "seq AS (SELECT vec_id % 8 AS seq, vec_id AS ts, embedding FROM embeddings)"

  /** Feedback-log CTE shared by the relevance-feedback gates: signal type
    * cycles with event_id, dwell/rating payloads are event-derived, and the
    * timestamp is synthetic (1700000000 + event_id % 10000 seconds).
    */
  private val feedbackCte =
    """fb AS (
      |  SELECT event_type AS collection,
      |         CASE user_id % 3 WHEN 0 THEN 'control' WHEN 1 THEN 'treatment_a'
      |              ELSE 'treatment_b' END AS variant,
      |         CASE event_id % 6 WHEN 0 THEN 'thumbs_up' WHEN 1 THEN 'thumbs_down'
      |              WHEN 2 THEN 'click' WHEN 3 THEN 'dwell' WHEN 4 THEN 'skip'
      |              ELSE 'rating' END AS signal_type,
      |         CAST(value * 1000 AS DOUBLE) AS dwell_ms,
      |         CAST(1 + event_id % 5 AS DOUBLE) AS rating,
      |         1700000000 + event_id % 10000 AS ts
      |  FROM events
      |),
      |scored AS (
      |  SELECT *,
      |         CASE signal_type
      |           WHEN 'thumbs_up' THEN 1.0 WHEN 'thumbs_down' THEN -1.0
      |           WHEN 'click' THEN 0.5
      |           WHEN 'dwell' THEN least(greatest((dwell_ms / 1000.0 - 3.0) / 5.0, -1.0), 1.0)
      |           WHEN 'skip' THEN -0.3
      |           ELSE (rating - 3.0) / 2.0 END AS s
      |  FROM fb
      |)""".stripMargin

  private def sequences(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings")
      .select((col("vec_id") % 8).as("seq"), col("vec_id").as("ts"),
        col("embedding"))

  private def feedbackLog(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events").select(
      col("event_type").as("collection"),
      when(col("user_id") % 3 === 0, "control")
        .when(col("user_id") % 3 === 1, "treatment_a")
        .otherwise("treatment_b").as("variant"),
      when(col("event_id") % 6 === 0, "thumbs_up")
        .when(col("event_id") % 6 === 1, "thumbs_down")
        .when(col("event_id") % 6 === 2, "click")
        .when(col("event_id") % 6 === 3, "dwell")
        .when(col("event_id") % 6 === 4, "skip")
        .otherwise("rating").as("signal_type"),
      (col("value") * 1000.0).as("dwell_ms"),
      (lit(1) + col("event_id") % 5).cast("double").as("rating"),
      (lit(1700000000L) + col("event_id") % 10000).as("ts"))

  /** Query trajectory: sequence 2's vectors in ts order (bounded — it is
    * the search literal, exactly the reference's query VectorSequence).
    */
  private def querySeq(s: org.apache.spark.sql.SparkSession,
                       dir: String): Seq[Array[Float]] =
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") % 8 === 2).orderBy(col("vec_id"))
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray).toSeq

  val defs: Map[String, Q] = Map(
    // Midpoint drift detection, KL method (= centroid euclidean —
    // temporal_sequences.rs:305-365), window 8, threshold 0.3.
    "seq_drift" -> Q(
      s"""WITH $seqCte,
        |ranked AS (
        |  SELECT seq, ts, embedding,
        |         row_number() OVER (PARTITION BY seq ORDER BY ts) AS rnk,
        |         count(*) OVER (PARTITION BY seq) AS n
        |  FROM seq
        |),
        |base AS (SELECT *, n // 2 AS mid FROM ranked WHERE n >= 16),
        |win AS (
        |  SELECT seq, mid, rnk, ts, embedding,
        |         CASE WHEN rnk > mid - 8 AND rnk <= mid THEN 'a'
        |              WHEN rnk > mid AND rnk <= mid + 8 THEN 'b' END AS w
        |  FROM base
        |),
        |bounds AS (
        |  SELECT seq,
        |         min(CASE WHEN rnk = mid - 7 THEN ts END) AS window_a_start,
        |         max(CASE WHEN rnk = mid + 8 THEN ts END) AS window_b_end
        |  FROM win GROUP BY seq
        |),
        |el AS (
        |  SELECT seq, w, generate_subscripts(embedding, 1) AS dim,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM win WHERE w IS NOT NULL
        |),
        |cent AS (
        |  SELECT seq, dim,
        |         (avg(CASE WHEN w = 'a' THEN x END)::FLOAT)::DOUBLE AS ca,
        |         (avg(CASE WHEN w = 'b' THEN x END)::FLOAT)::DOUBLE AS cb
        |  FROM el GROUP BY seq, dim
        |),
        |sc AS (SELECT seq, sqrt(sum((ca - cb) * (ca - cb))) AS score
        |       FROM cent GROUP BY seq)
        |SELECT s.seq, round(s.score, 6) AS score,
        |       CAST(CASE WHEN s.score > 0.3 THEN 1 ELSE 0 END AS BIGINT) AS drift_detected,
        |       b.window_a_start, b.window_b_end
        |FROM sc s JOIN bounds b ON s.seq = b.seq
        |ORDER BY s.seq""".stripMargin
    ) { (s, dir) =>
      Temporal.detectDrift(sequences(s, dir), col("seq"), col("ts"),
          col("embedding"), Temporal.DriftMethod.KlDivergence,
          windowSize = 8, threshold = 0.3)
        .select(col("seq"), round(col("score"), 6).as("score"),
          col("drift_detected").cast("long").as("drift_detected"),
          col("window_a_start"), col("window_b_end"))
        .orderBy(col("seq"))
    },

    // Trend vector = centroid(last 10) − centroid(first 10) per sequence
    // (temporal_sequences.rs:153-178), f32 window centroids.
    "seq_trend" -> Q(
      s"""WITH $seqCte,
        |ranked AS (
        |  SELECT seq, embedding,
        |         row_number() OVER (PARTITION BY seq ORDER BY ts) AS rnk,
        |         count(*) OVER (PARTITION BY seq) AS n
        |  FROM seq
        |),
        |base AS (SELECT * FROM ranked WHERE n >= 20),
        |el AS (
        |  SELECT seq, rnk, n, generate_subscripts(embedding, 1) AS dim,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM base
        |),
        |c AS (
        |  SELECT seq, dim,
        |         (avg(CASE WHEN rnk <= 10 THEN x END)::FLOAT)::DOUBLE AS fc,
        |         (avg(CASE WHEN rnk > n - 10 THEN x END)::FLOAT)::DOUBLE AS lc
        |  FROM el GROUP BY seq, dim
        |)
        |SELECT seq, dim - 1 AS dim, round(lc - fc, 6) AS delta
        |FROM c ORDER BY seq, dim""".stripMargin
    ) { (s, dir) =>
      Temporal.trend(sequences(s, dir), col("seq"), col("ts"),
          col("embedding"), windowSize = 10)
        .select(col("seq"), col("dim"), round(col("delta"), 6).as("delta"))
        .orderBy(col("seq"), col("dim"))
    },

    // Trajectory search by centroid distance (temporal_sequences.rs:
    // 415-447, CentroidDistance arm) — query = sequence 2, self excluded.
    "trajectory_centroid" -> Q(
      s"""WITH $seqCte,
        |el AS (
        |  SELECT seq, generate_subscripts(embedding, 1) AS dim,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM seq
        |),
        |cent AS (SELECT seq, dim, avg(x)::FLOAT AS c FROM el GROUP BY seq, dim),
        |qc AS (SELECT dim, c FROM cent WHERE seq = 2),
        |d AS (
        |  SELECT a.seq,
        |         sqrt(sum((a.c::DOUBLE - q.c::DOUBLE) * (a.c::DOUBLE - q.c::DOUBLE))) AS distance
        |  FROM cent a JOIN qc q ON a.dim = q.dim
        |  WHERE a.seq <> 2 GROUP BY a.seq
        |)
        |SELECT seq, round(distance, 6) AS distance
        |FROM d ORDER BY distance, seq LIMIT 5""".stripMargin
    ) { (s, dir) =>
      Temporal.searchTrajectory(sequences(s, dir), col("seq"), col("ts"),
          col("embedding"), querySeq(s, dir),
          Temporal.TrajectoryDistance.CentroidDistance, limit = 5,
          excludeSeq = Some(2))
        .select(col("seq"), round(col("distance"), 6).as("distance"))
    },

    // DTW + discrete-Fréchet trajectory search (temporal_sequences.rs:
    // 206-266) — both DPs replicate in DuckDB as nested list_reduce folds:
    // the outer fold carries the rolling DP row over the query's points,
    // the inner fold rebuilds the row over the stored trajectory's points
    // (the column index recovered as len(acc), the border sentinel the
    // same padded +inf row the Scala kernels use), so the whole ranking is
    // a full hash oracle.
    "trajectory_dtw" -> Q(
      """WITH traj AS (
        |  SELECT CAST(vec_id % 8 AS BIGINT) AS seq,
        |         list(embedding::DOUBLE[] ORDER BY vec_id) AS t
        |  FROM embeddings GROUP BY 1
        |),
        |q AS (SELECT t AS qt FROM traj WHERE seq = 2),
        |scored AS (
        |  SELECT seq,
        |    list_reduce(
        |      list_prepend(list_concat([0.0], list_transform(range(len(t)), x -> 1e308)), qt),
        |      (prev, p) -> list_reduce(
        |        list_prepend([1e308], t),
        |        (acc, bj) -> list_append(acc,
        |          sqrt(list_sum(list_transform(range(1, len(p)+1), d -> (p[d]-bj[d])^2)))
        |          + least(prev[len(acc)+1], acc[len(acc)], prev[len(acc)])))
        |    )[len(t)+1] AS dtw,
        |    list_reduce(
        |      list_prepend(list_concat([0.0], list_transform(range(len(t)), x -> 1e308)), qt),
        |      (prev, p) -> list_reduce(
        |        list_prepend([1e308], t),
        |        (acc, bj) -> list_append(acc,
        |          greatest(sqrt(list_sum(list_transform(range(1, len(p)+1), d -> (p[d]-bj[d])^2))),
        |                   least(prev[len(acc)+1], acc[len(acc)], prev[len(acc)])))))[len(t)+1] AS fr
        |  FROM traj, q
        |),
        |sel AS (SELECT seq, dtw, fr FROM scored ORDER BY dtw, seq LIMIT 5)
        |SELECT seq, round(dtw, 6) AS distance, round(fr, 6) AS frechet
        |FROM sel ORDER BY distance, seq""".stripMargin
    ) { (s, dir) =>
      val q = querySeq(s, dir)
      val seqs = sequences(s, dir)
      // one trajectories pass computes both kernels (no second shuffle)
      Temporal.searchTrajectoryBoth(seqs, col("seq"), col("ts"),
          col("embedding"), q, limit = 5)
        .select(col("seq"), round(col("distance"), 6).as("distance"),
          round(col("frechet"), 6).as("frechet"))
        .orderBy(col("distance").asc, col("seq").asc)
    },

    // Feedback → parameter adjustments (relevance_feedback.rs:293-343):
    // decay-weighted avg relevance per collection, ef_search nudged up when
    // ratings are poor, positive ratio as rerank weight.
    "feedback_adjust" -> Q(
      s"""WITH $feedbackCte,
        |agg AS (
        |  SELECT collection,
        |         sum(s * pow(0.95, greatest((1700010000 - ts) / 3600.0, 0.0))) /
        |           sum(pow(0.95, greatest((1700010000 - ts) / 3600.0, 0.0))) AS avg_relevance,
        |         CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS rerank_weight,
        |         count(*) AS event_count
        |  FROM scored GROUP BY collection HAVING count(*) >= 10
        |)
        |SELECT collection,
        |       round(least(greatest(1.0 + 0.01 * (1.0 - avg_relevance), 0.5), 2.0), 6) AS ef_search_factor,
        |       round(rerank_weight, 6) AS rerank_weight,
        |       round(avg_relevance, 6) AS avg_relevance,
        |       event_count,
        |       round(least(event_count / 100.0, 1.0), 6) AS confidence
        |FROM agg ORDER BY collection""".stripMargin
    ) { (s, dir) =>
      val fb = feedbackLog(s, dir)
        .withColumn("s", RelevanceFeedback.relevanceScore(
          col("signal_type"), col("dwell_ms"), col("rating")))
      RelevanceFeedback.computeAdjustments(fb, col("collection"), col("s"),
          col("ts"), now = 1700010000L)
        .select(col("collection"),
          round(col("ef_search_factor"), 6).as("ef_search_factor"),
          round(col("rerank_weight"), 6).as("rerank_weight"),
          round(col("avg_relevance"), 6).as("avg_relevance"),
          col("event_count"), round(col("confidence"), 6).as("confidence"))
        .orderBy(col("collection"))
    },

    // A/B variant report (relevance_feedback.rs:199-241): per-variant
    // stats, winner = best avg relevance among eligible variants.
    "ab_report" -> Q(
      s"""WITH $feedbackCte,
        |per AS (
        |  SELECT variant, count(*) AS event_count, avg(s) AS avg_relevance
        |  FROM scored GROUP BY variant
        |),
        |flagged AS (
        |  SELECT variant, event_count, avg_relevance,
        |         CASE WHEN event_count >= 10 AND
        |              row_number() OVER (ORDER BY (event_count >= 10) DESC,
        |                                 avg_relevance DESC, variant ASC) = 1
        |              THEN 1 ELSE 0 END AS winner
        |  FROM per
        |)
        |SELECT variant, event_count, round(avg_relevance, 6) AS avg_relevance,
        |       CAST(winner AS BIGINT) AS winner
        |FROM flagged ORDER BY variant""".stripMargin
    ) { (s, dir) =>
      val fb = feedbackLog(s, dir)
        .withColumn("s", RelevanceFeedback.relevanceScore(
          col("signal_type"), col("dwell_ms"), col("rating")))
      RelevanceFeedback.abReport(fb, col("variant"), col("s"))
        .select(col("variant"), col("event_count"),
          round(col("avg_relevance"), 6).as("avg_relevance"),
          col("winner").cast("long").as("winner"))
        .orderBy(col("variant"))
    },
  )
}
