package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential privacy for vector search (reference:
  * src/enterprise/privacy.rs).
  *
  * The reference perturbs each result's distance with Laplace/Gaussian
  * noise drawn from `thread_rng` (privacy.rs:188-207) and accounts an
  * epsilon budget per session. A thread-local RNG is the wrong shape for
  * a distributed engine — executors would each draw their own stream and
  * the result would be non-reproducible across retries (Spark may
  * recompute a partition, and a recomputed partition MUST produce the
  * same rows). So the noise here is a deterministic function of
  * (row id, query seed): a 64-bit LCG step hashed from the id maps to a
  * uniform in (0,1), then the same inverse-CDF transforms the reference
  * applies (Laplace via sign/log, privacy.rs:188-194; Gaussian via
  * Box-Muller, privacy.rs:197-207). Per-query seeds restore the "fresh
  * noise each query" DP contract while keeping every partition
  * recompute-stable, and the whole pipeline stays inside whole-stage
  * codegen (pure column arithmetic, no UDF).
  *
  * Budget accounting (basic / advanced / Rényi composition,
  * privacy.rs:253-264) is driver-side bookkeeping, as in the reference.
  */
object Privacy {

  sealed trait NoiseMechanism
  object NoiseMechanism {
    case object Laplace extends NoiseMechanism
    case object Gaussian extends NoiseMechanism
  }

  /** privacy.rs:44-104. */
  final case class PrivacyConfig(epsilon: Double,
                                 delta: Double = 1e-5,
                                 sensitivity: Double = 1.0,
                                 mechanism: NoiseMechanism =
                                   NoiseMechanism.Laplace,
                                 budgetTracking: Boolean = true,
                                 maxBudgetPerSession: Double = 10.0) {
    require(epsilon > 0, "epsilon must be positive")
    require(delta > 0 && delta < 1, "delta must be in (0,1)")
  }

  /** privacy.rs:238-252. */
  final case class PrivacyExplain(mechanism: String, epsilon: Double,
                                  delta: Double, sensitivity: Double,
                                  noiseScale: Double, budgetTracking: Boolean,
                                  maxBudget: Double)

  /** Deterministic uniform in (0,1) from (id, seed): MINSTD Lehmer steps
    * (multiplier 48271, modulus 2^31−1) around one SQUARING mix. The
    * quadratic step matters: a pure Lehmer chain is affine in (id, seed),
    * so two streams at different seeds would differ by a constant offset
    * mod 1 — correlated uniforms that break Box-Muller. Squaring makes
    * the seed/id dependence nonlinear. Every intermediate stays below
    * 2^62, so the arithmetic is exact LONG math under ANSI mode (no
    * wraparound anywhere) and an oracle replays it with plain `%`. The
    * +0.5 offset keeps the result strictly inside (0,1); u can land
    * exactly on 0.5, where the Laplace inverse CDF is correctly zero.
    *
    * The key is normalized to LONG explicitly before the chain: integral
    * keys (numeric columns, or strings like "42") keep their numeric
    * value, so the SQL oracle replays them with plain `%`; any other key
    * (e.g. "v42" — string ids are first-class elsewhere in the engine) is
    * hashed to a stable long with xxhash64. Without this, a string id
    * would resolve via implicit string→double coercion (or fail outright
    * under ANSI), silently breaking the exact-integer determinism the DP
    * noise depends on.
    */
  def uniform01(id: Column, seed: Long): Column = {
    val m = 2147483647L
    val asStr = id.cast("string")
    // the rlike guard keeps the long cast off non-integral keys, so the
    // branch is ANSI-safe (CaseWhen evaluates lazily)
    val key = when(asStr.rlike("^-?[0-9]{1,18}$"), asStr.cast("long"))
      .otherwise(pmod(xxhash64(asStr), lit(m)))
    val s0 = pmod(pmod(key, lit(m)) * lit(48271L) + lit(seed % m), lit(m))
    val s1 = pmod((s0 + lit(1L)) * lit(48271L), lit(m))
    val sq = pmod(s1 * s1 + s1, lit(m))
    val s2 = pmod((sq + lit(1L)) * lit(48271L), lit(m))
    (s2.cast("double") + lit(0.5)) / lit(m.toDouble)
  }

  final class PrivacyMechanism(val config: PrivacyConfig) {

    /** Effective noise scale (privacy.rs:209-219): Laplace b = Δ/ε;
      * Gaussian σ = Δ·√(2·ln(1.25/δ))/ε.
      */
    def noiseScale(sensitivity: Double = config.sensitivity): Double =
      config.mechanism match {
        case NoiseMechanism.Laplace => sensitivity / config.epsilon
        case NoiseMechanism.Gaussian =>
          sensitivity * math.sqrt(2.0 * math.log(1.25 / config.delta)) /
            config.epsilon
      }

    /** Noise column for a row keyed by `id` (privacy.rs:188-207 with the
      * deterministic uniforms documented above). Laplace inverse CDF:
      * -b·sign(u-½)·ln(1-2|u-½|). Gaussian: Box-Muller from two
      * decorrelated uniforms.
      */
    def noise(id: Column, seed: Long,
              sensitivity: Double = config.sensitivity): Column =
      config.mechanism match {
        case NoiseMechanism.Laplace =>
          val u = uniform01(id, seed) - lit(0.5)
          lit(-noiseScale(sensitivity)) * signum(u) *
            log(lit(1.0) - lit(2.0) * abs(u))
        case NoiseMechanism.Gaussian =>
          val u1 = uniform01(id, seed)
          val u2 = uniform01(id, seed + 0x9e3779b97f4a7c15L)
          sqrt(lit(-2.0) * log(u1)) *
            cos(lit(2.0 * math.Pi) * u2) * lit(noiseScale(sensitivity))
      }

    /** Perturbed distance, clamped at 0 (privacy.rs:173-179). With
      * `roundTo` set, distance and noise are each rounded first so the
      * sum is reproducible across engines (the repo-wide oracle
      * convention: comparisons happen on 6-decimal values, never on
      * accumulation-order-sensitive doubles).
      */
    def perturbDistance(distance: Column, id: Column, seed: Long,
                        sensitivity: Double = config.sensitivity,
                        roundTo: Option[Int] = None): Column =
      roundTo match {
        case Some(r) =>
          greatest(lit(0.0),
            round(distance, r) + round(noise(id, seed, sensitivity), r))
        case None =>
          greatest(lit(0.0), distance + noise(id, seed, sensitivity))
      }

    def explain: PrivacyExplain =
      PrivacyExplain(config.mechanism.toString, config.epsilon, config.delta,
        config.sensitivity, noiseScale(), config.budgetTracking,
        config.maxBudgetPerSession)
  }

  /** Per-session epsilon ledger (privacy.rs:106-157). */
  final class PrivacyBudget {
    private val spent = mutable.LinkedHashMap.empty[String, Double]
    private var queries = 0L

    def hasBudget(sessionId: String, epsilon: Double,
                  maxBudget: Double): Boolean =
      spent.getOrElse(sessionId, 0.0) + epsilon <= maxBudget

    def consume(sessionId: String, epsilon: Double,
                maxBudget: Double): Boolean = synchronized {
      if (!hasBudget(sessionId, epsilon, maxBudget)) false
      else {
        spent.update(sessionId, spent.getOrElse(sessionId, 0.0) + epsilon)
        queries += 1
        true
      }
    }

    def remaining(sessionId: String, maxBudget: Double): Double =
      math.max(0.0, maxBudget - spent.getOrElse(sessionId, 0.0))

    def reset(sessionId: String): Unit = synchronized(spent.remove(sessionId))
    def totalQueries: Long = queries
    def summary: Seq[(String, Double)] = spent.toSeq
  }

  /** privacy.rs:253-264. */
  sealed trait CompositionTheorem {
    /** Total privacy cost of `k` queries at `epsilon` each. */
    def total(epsilon: Double, k: Int, deltaPrime: Double = 1e-6): Double
  }
  object CompositionTheorem {
    /** ε_total = k·ε. */
    case object Basic extends CompositionTheorem {
      def total(epsilon: Double, k: Int, deltaPrime: Double): Double =
        k * epsilon
    }
    /** ε_total ≈ √(2k·ln(1/δ'))·ε + k·ε·(e^ε − 1). */
    case object Advanced extends CompositionTheorem {
      def total(epsilon: Double, k: Int, deltaPrime: Double): Double =
        math.sqrt(2.0 * k * math.log(1.0 / deltaPrime)) * epsilon +
          k * epsilon * (math.exp(epsilon) - 1.0)
    }
    /** Rényi DP composition at order α, converted back to (ε, δ'):
      * ε_total = k·ε²/2 + √(k·ε²·ln(1/δ')) (the standard RDP-of-Gaussian
      * bound the reference names as its tighter option).
      */
    case object Renyi extends CompositionTheorem {
      def total(epsilon: Double, k: Int, deltaPrime: Double): Double =
        k * epsilon * epsilon / 2.0 +
          math.sqrt(k * epsilon * epsilon * math.log(1.0 / deltaPrime))
    }
  }

  /** Per-collection policy + registry (privacy.rs:274-345). */
  final case class CollectionPrivacyPolicy(collectionName: String,
                                           config: PrivacyConfig,
                                           composition: CompositionTheorem =
                                             CompositionTheorem.Basic,
                                           enforced: Boolean = true,
                                           fieldSensitivities:
                                             Map[String, Double] = Map.empty)

  final class PrivacyPolicyRegistry {
    private val policies =
      mutable.LinkedHashMap.empty[String, CollectionPrivacyPolicy]
    val budget = new PrivacyBudget

    def register(policy: CollectionPrivacyPolicy): Unit =
      policies.update(policy.collectionName, policy)
    def policy(collection: String): Option[CollectionPrivacyPolicy] =
      policies.get(collection)

    /** DP top-k search: exact distances, deterministic calibrated noise,
      * re-rank on the noisy distance. Enforced policies consume budget
      * first and refuse when the session is spent. The noisy distance is
      * the only score the caller sees — the DP contract.
      */
    def privateSearch(collection: String, sessionId: String, df: DataFrame,
                      vecCol: Column, query: Column, k: Int, seed: Long,
                      metric: String = "cosine", idCol: String = "id",
                      roundTo: Option[Int] = None): DataFrame = {
      val p = policies.getOrElse(collection,
        throw new NoSuchElementException(s"No privacy policy for '$collection'"))
      if (p.enforced && p.config.budgetTracking &&
          !budget.consume(sessionId, p.config.epsilon,
            p.config.maxBudgetPerSession))
        throw new IllegalStateException(
          s"Privacy budget exhausted for session '$sessionId'")
      val mech = new PrivacyMechanism(p.config)
      Search.withDistance(df, vecCol, query, metric)
        .withColumn("noisy_distance",
          mech.perturbDistance(col("distance"), col(idCol), seed,
            p.config.sensitivity, roundTo))
        .drop("distance")
        .orderBy(col("noisy_distance").asc, col(idCol).asc)
        .limit(k)
    }
  }
}
