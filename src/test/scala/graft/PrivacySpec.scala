package graft

import org.apache.spark.sql.functions._

import graft.ops.Privacy
import graft.ops.Privacy._

/** Differential privacy (reference src/enterprise/privacy.rs):
  * deterministic calibrated noise (the distributed replacement for the
  * reference's thread_rng draw), budget ledger, composition theorems,
  * and the enforced private-search path.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 4000L).toDF("id")

  test("uniform01: deterministic, in (0,1), seed-sensitive, roughly uniform") {
    val u = ids.select(Privacy.uniform01(col("id"), seed = 7).as("u"))
      .as[Double].collect()
    assert(u.forall(x => x > 0.0 && x < 1.0))
    val u2 = ids.select(Privacy.uniform01(col("id"), seed = 7).as("u"))
      .as[Double].collect()
    assert(u.sameElements(u2), "same (id, seed) must give identical uniforms")
    val uOther = ids.select(Privacy.uniform01(col("id"), seed = 8).as("u"))
      .as[Double].collect()
    assert(u.zip(uOther).count { case (a, b) => a == b } < 10)
    val mean = u.sum / u.length
    assert(math.abs(mean - 0.5) < 0.02, s"uniform mean drifted: $mean")
    // quartile occupancy: each of 4 bins within 20% of expected
    val bins = u.groupBy(x => (x * 4).toInt).view.mapValues(_.length)
    (0 until 4).foreach(b => assert(
      math.abs(bins.getOrElse(b, 0) - 1000) < 200, s"bin $b: ${bins.get(b)}"))
  }

  test("uniform01: string ids are first-class — integral strings match " +
      "numeric ids, non-integral strings are deterministic and uniform") {
    // "42" must produce the SAME uniform as 42L (the oracle replays
    // integral keys with plain %), not a string→double coercion artifact
    val numeric = ids.select(Privacy.uniform01(col("id"), seed = 7).as("u"))
      .as[Double].collect()
    val viaString = ids.select(
      Privacy.uniform01(col("id").cast("string"), seed = 7).as("u"))
      .as[Double].collect()
    assert(numeric.sameElements(viaString))
    // non-integral ids (the engine's "v42"-style string ids): in range,
    // deterministic, seed-sensitive, not collapsed to one hash bucket
    val sids = ids.select(concat(lit("v"), col("id")).as("sid"))
    val u = sids.select(Privacy.uniform01(col("sid"), seed = 7).as("u"))
      .as[Double].collect()
    assert(u.forall(x => x > 0.0 && x < 1.0))
    val u2 = sids.select(Privacy.uniform01(col("sid"), seed = 7).as("u"))
      .as[Double].collect()
    assert(u.sameElements(u2))
    assert(u.distinct.length > u.length / 2, "string ids must spread")
    val mean = u.sum / u.length
    assert(math.abs(mean - 0.5) < 0.03, s"string-id uniform mean: $mean")
  }

  test("Laplace noise: zero-centered, scale matches sensitivity/epsilon") {
    val mech = new PrivacyMechanism(PrivacyConfig(epsilon = 0.5,
      sensitivity = 2.0))
    assert(mech.noiseScale() == 4.0)
    val n = ids.select(mech.noise(col("id"), seed = 3).as("n"))
      .as[Double].collect()
    val mean = n.sum / n.length
    // Laplace(b): mean 0, E|X| = b
    assert(math.abs(mean) < 0.3, s"laplace mean drifted: $mean")
    val meanAbs = n.map(math.abs).sum / n.length
    assert(math.abs(meanAbs - 4.0) < 0.4, s"laplace E|X| drifted: $meanAbs")
  }

  test("Gaussian noise: zero-centered, sigma = s*sqrt(2 ln(1.25/delta))/eps") {
    val cfg = PrivacyConfig(epsilon = 1.0, delta = 1e-5, sensitivity = 1.0,
      mechanism = NoiseMechanism.Gaussian)
    val mech = new PrivacyMechanism(cfg)
    val sigma = math.sqrt(2.0 * math.log(1.25 / 1e-5))
    assert(math.abs(mech.noiseScale() - sigma) < 1e-12)
    val n = ids.select(mech.noise(col("id"), seed = 11).as("n"))
      .as[Double].collect()
    val mean = n.sum / n.length
    val sd = math.sqrt(n.map(x => (x - mean) * (x - mean)).sum / n.length)
    assert(math.abs(mean) < sigma * 0.1, s"gaussian mean drifted: $mean")
    assert(math.abs(sd - sigma) / sigma < 0.1, s"gaussian sd drifted: $sd vs $sigma")
  }

  test("perturbDistance clamps at zero and rounds when asked") {
    val mech = new PrivacyMechanism(PrivacyConfig(epsilon = 0.1,
      sensitivity = 5.0)) // huge noise: negatives guaranteed
    val d = ids.limit(500).select(
      mech.perturbDistance(lit(0.001), col("id"), seed = 1).as("d"))
      .as[Double].collect()
    assert(d.forall(_ >= 0.0))
    assert(d.count(_ == 0.0) > 0, "with scale 50, some draws must clamp")
    val r = ids.limit(10).select(
      mech.perturbDistance(lit(0.12345678), col("id"), seed = 1,
        sensitivity = 0.001, roundTo = Some(6)).as("d"))
      .as[Double].collect()
    r.foreach(x => assert((math.round(x * 1e6) / 1e6 - x).abs < 1e-12))
  }

  test("privacy budget: consume, refuse past max, remaining, reset") {
    val b = new PrivacyBudget
    assert(b.consume("s1", 4.0, 10.0))
    assert(b.consume("s1", 4.0, 10.0))
    assert(!b.consume("s1", 4.0, 10.0), "12 > 10 must refuse")
    assert(b.remaining("s1", 10.0) == 2.0)
    assert(b.consume("s2", 1.0, 10.0), "sessions are independent")
    b.reset("s1")
    assert(b.remaining("s1", 10.0) == 10.0)
    assert(b.totalQueries == 3)
  }

  test("composition theorems: basic linear, advanced superlinear but sublinear-in-k") {
    import CompositionTheorem._
    assert(Basic.total(0.5, 10) == 5.0)
    val adv = Advanced.total(0.1, 100, 1e-6)
    val expected = math.sqrt(2.0 * 100 * math.log(1e6)) * 0.1 +
      100 * 0.1 * (math.exp(0.1) - 1.0)
    assert(math.abs(adv - expected) < 1e-12)
    // advanced beats basic for many small-eps queries
    assert(adv < Basic.total(0.1, 100) * 2)
    val renyi = Renyi.total(0.1, 100, 1e-6)
    assert(renyi > 0 && renyi < Advanced.total(0.1, 100, 1e-6))
  }

  test("privateSearch: enforced budget, deterministic per seed, noisy ranking") {
    val emb = sf("embeddings")
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val df = emb.crossJoin(broadcast(qv))
    val reg = new PrivacyPolicyRegistry
    reg.register(CollectionPrivacyPolicy("c",
      PrivacyConfig(epsilon = 4.0, sensitivity = 0.05,
        maxBudgetPerSession = 10.0)))
    def run(seed: Long) = reg.privateSearch("c", "sess", df,
      col("embedding"), col("qv"), k = 10, seed = seed, idCol = "vec_id",
      roundTo = Some(6)).select("vec_id").as[Long].collect().toSeq
    val a = run(1)
    val b = run(1)
    intercept[IllegalStateException](run(1)) // 3rd query: 12 > 10
    assert(a == b, "same seed must reproduce the same private ranking")
    assert(reg.budget.remaining("sess", 10.0) == 2.0)
    // a different session has fresh budget, and a different seed usually
    // produces a different ranking (noise scale ~ distance spread)
    val c = reg.privateSearch("c", "sess2", df, col("embedding"), col("qv"),
      k = 10, seed = 99, idCol = "vec_id", roundTo = Some(6))
      .select("vec_id").as[Long].collect().toSeq
    assert(a != c, "fresh seed should reshuffle the noisy top-k")
  }

  test("explain reports the effective scale; unknown collection refuses") {
    val mech = new PrivacyMechanism(PrivacyConfig(epsilon = 2.0,
      sensitivity = 1.0))
    val e = mech.explain
    assert(e.mechanism == "Laplace" && e.noiseScale == 0.5 &&
      e.maxBudget == 10.0)
    val reg = new PrivacyPolicyRegistry
    intercept[NoSuchElementException] {
      reg.privateSearch("nope", "s", ids.toDF("id"), col("id"), col("id"),
        1, 1)
    }
  }
}
