package graft

import org.apache.spark.sql.functions._

import graft.ops.{RelevanceFeedback, Temporal}

/** Temporal sequences (reference: experimental/temporal_sequences.rs) and
  * relevance feedback (experimental/relevance_feedback.rs).
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def seqDf(rows: (Int, Long, Seq[Float])*) =
    rows.toDF("seq", "ts", "vec")

  // ------------------------------------------------------------- kernels

  test("dtw: identical sequences are 0; known asymmetric case matches hand DP") {
    val a = Seq(Seq(0f), Seq(1f), Seq(2f))
    assert(Temporal.dtw(a, a) === 0.0)
    // query [0,1], target [0,1,2]: warping path 0-0,1-1,1-2 → 0+0+1 = 1
    assert(Temporal.dtw(Seq(Seq(0f), Seq(1f)), a) === 1.0)
    // empty side → MAX sentinel (temporal_sequences.rs:211-213)
    assert(Temporal.dtw(Seq.empty, a) === Double.MaxValue)
  }

  test("frechet: max-of-mins 'dog walk' — offset line is the offset, not the sum") {
    val a = Seq(Seq(0f), Seq(1f), Seq(2f))
    val b = Seq(Seq(0.5f), Seq(1.5f), Seq(2.5f))
    // each point pairs with its offset twin: Fréchet = 0.5, DTW = 1.5
    assert(math.abs(Temporal.frechet(a, b) - 0.5) < 1e-9)
    assert(math.abs(Temporal.dtw(a, b) - 1.5) < 1e-9)
    assert(Temporal.frechet(a, a) === 0.0)
  }

  test("dtw dominates frechet on random trajectories (sum >= max over path)") {
    val rnd = new scala.util.Random(7)
    val mk = (n: Int) => Seq.fill(n)(Seq.fill(4)(rnd.nextFloat()))
    for (_ <- 1 to 10) {
      val (x, y) = (mk(5 + rnd.nextInt(6)), mk(5 + rnd.nextInt(6)))
      assert(Temporal.dtw(x, y) + 1e-9 >= Temporal.frechet(x, y))
    }
  }

  // ---------------------------------------------------------- aggregates

  test("trend = last-window centroid minus first-window centroid; short seqs omitted") {
    // seq 0: drifts from ~0 to ~10 in dim 0; seq 1 too short (3 < 2*2)
    val rows = (0 until 8).map(i => (0, i.toLong, Seq(i.toFloat, 1f))) ++
      Seq((1, 0L, Seq(0f, 0f)), (1, 1L, Seq(1f, 1f)), (1, 2L, Seq(2f, 2f)))
    val t = Temporal.trend(seqDf(rows: _*), col("seq"), col("ts"), col("vec"),
      windowSize = 2).collect()
    assert(t.forall(_.getInt(0) == 0), "short sequence must be omitted")
    val d0 = t.find(r => r.getInt(1) == 0).get.getDouble(2)
    // first window {0,1} avg 0.5; last {6,7} avg 6.5 → delta 6
    assert(math.abs(d0 - 6.0) < 1e-6)
    val d1 = t.find(r => r.getInt(1) == 1).get.getDouble(2)
    assert(math.abs(d1) < 1e-6)
  }

  test("detectDrift flags a mean shift and reports window boundary timestamps") {
    // 12 entries: first 6 near 0, last 6 near 5 → drift at midpoint
    val rows = (0 until 12).map { i =>
      (0, (100 + i).toLong, Seq(if (i < 6) 0f else 5f, 0f))
    }
    val d = Temporal.detectDrift(seqDf(rows: _*), col("seq"), col("ts"),
      col("vec"), Temporal.DriftMethod.KlDivergence, windowSize = 3,
      threshold = 1.0).collect()
    assert(d.length == 1)
    val r = d.head
    assert(math.abs(r.getAs[Double]("score") - 5.0) < 1e-6)
    assert(r.getAs[Boolean]("drift_detected"))
    // mid = 6; window A ranks 4..6 → start ts = 103; B ranks 7..9 → end 108
    assert(r.getAs[Long]("window_a_start") == 103L)
    assert(r.getAs[Long]("window_b_end") == 108L)
  }

  test("cosine drift: orthogonal window centroids score 1; guard hits zero vectors") {
    val rows = (0 until 4).map(i => (0, i.toLong, Seq(1f, 0f))) ++
      (4 until 8).map(i => (0, i.toLong, Seq(0f, 1f))) ++
      (0 until 8).map(i => (1, i.toLong, Seq(0f, 0f)))
    val d = Temporal.detectDrift(seqDf(rows: _*), col("seq"), col("ts"),
        col("vec"), Temporal.DriftMethod.CosineDrift, windowSize = 2,
        threshold = 0.5)
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("score")).toMap
    assert(math.abs(d(0) - 1.0) < 1e-6)  // 1 − cos(90°)
    assert(d(1) === 1.0)                  // magnitude < 1e-10 → 1.0
  }

  test("searchTrajectory: planted duplicate ranks first at 0 for all three methods") {
    val base = (0 until 6).map(i => (0, i.toLong, Seq(i.toFloat, 2f)))
    val dup = base.map { case (_, t, v) => (1, t, v) }
    val far = (0 until 6).map(i => (2, i.toLong, Seq(i.toFloat + 50f, 2f)))
    val df = seqDf(base ++ dup ++ far: _*)
    val q = base.map(_._3.toArray)
    for (m <- Seq(Temporal.TrajectoryDistance.Dtw,
        Temporal.TrajectoryDistance.Frechet,
        Temporal.TrajectoryDistance.CentroidDistance)) {
      val top = Temporal.searchTrajectory(df, col("seq"), col("ts"),
        col("vec"), q, m, limit = 3, excludeSeq = Some(0)).collect()
      assert(top.head.getInt(0) == 1, s"$m: duplicate must rank first")
      assert(top.head.getAs[Double]("distance") < 1e-6)
      assert(top.last.getInt(0) == 2, s"$m: far sequence must rank last")
    }
  }

  test("trajectories caps at the most recent maxTrajectoryLen entries") {
    val rows = (0 until 10).map(i => (0, i.toLong, Seq(i.toFloat)))
    val t = Temporal.trajectories(seqDf(rows: _*), col("seq"), col("ts"),
      col("vec")).collect().head
    val traj = t.getSeq[Seq[Float]](1)
    assert(traj.length == 10 && traj.head.head == 0f && traj.last.head == 9f,
      "under the cap the full ordered trajectory survives")
  }

  // ---------------------------------------------------- relevance feedback

  test("relevanceScore maps every signal per the reference table") {
    val df = Seq(
      ("thumbs_up", 0.0, 0.0), ("thumbs_down", 0.0, 0.0), ("click", 0.0, 0.0),
      ("dwell", 8000.0, 0.0),   // (8−3)/5 = 1.0
      ("dwell", 500.0, 0.0),    // (0.5−3)/5 = −0.5
      ("skip", 0.0, 0.0), ("rating", 0.0, 5.0), ("rating", 0.0, 1.0))
      .toDF("t", "ms", "r")
      .withColumn("s", RelevanceFeedback.relevanceScore(col("t"), col("ms"), col("r")))
    val s = df.collect().map(_.getAs[Double]("s"))
    assert(s.toSeq == Seq(1.0, -1.0, 0.5, 1.0, -0.5, -0.3, 1.0, -1.0))
  }

  test("computeAdjustments: poor ratings push ef_search up; min-events gate filters") {
    val now = 1000L * 3600
    // collection "bad": 10 thumbs_down now → avg −1 → ef = 1 + 0.01·2 = 1.02
    // collection "tiny": 5 events → below min_events, omitted
    val fb = ((1 to 10).map(i => ("bad", -1.0, now)) ++
      (1 to 5).map(i => ("tiny", 1.0, now))).toDF("c", "s", "ts")
    val adj = RelevanceFeedback.computeAdjustments(fb, col("c"), col("s"),
      col("ts"), now).collect()
    assert(adj.length == 1 && adj.head.getString(0) == "bad")
    assert(math.abs(adj.head.getAs[Double]("ef_search_factor") - 1.02) < 1e-9)
    assert(adj.head.getAs[Double]("rerank_weight") === 0.0)
    assert(math.abs(adj.head.getAs[Double]("confidence") - 0.1) < 1e-9)
  }

  test("temporal decay discounts old feedback (0.95^hours)") {
    val now = 100L * 3600
    // one fresh thumbs_up, one day-old thumbs_down:
    // w_old = 0.95^24 ≈ 0.2920; avg = (1 − w)/(1 + w)
    val fb = (Seq.fill(9)(("c", 1.0, now)) :+ ("c", -1.0, now - 24 * 3600))
      .toDF("c", "s", "ts")
    val w = math.pow(0.95, 24.0)
    val expected = (9.0 - w) / (9.0 + w)
    val got = RelevanceFeedback.computeAdjustments(fb, col("c"), col("s"),
      col("ts"), now).collect().head.getAs[Double]("avg_relevance")
    assert(math.abs(got - expected) < 1e-9)
  }

  test("abReport: winner needs >= minEvents and the best avg relevance") {
    val fb = (Seq.fill(12)(("control", 0.1)) ++ Seq.fill(15)(("treat", 0.8)) ++
      Seq.fill(3)(("lucky", 1.0))).toDF("v", "s")
    val rep = RelevanceFeedback.abReport(fb, col("v"), col("s"))
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("winner")).toMap
    assert(rep("treat"), "best eligible variant wins")
    assert(!rep("lucky"), "under-sampled variant cannot win despite top score")
    assert(!rep("control"))
  }

  test("shouldRollback flags collections below the guardrail") {
    val now = 0L
    val fb = (Seq.fill(10)(("sinking", -0.9, now)) ++
      Seq.fill(10)(("fine", 0.5, now))).toDF("c", "s", "ts")
    val rb = RelevanceFeedback.shouldRollback(fb, col("c"), col("s"),
      col("ts"), now).collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rb("sinking") && !rb("fine"))
  }
}
