package graft

import org.apache.spark.sql.functions._

import graft.ann.EncryptedSearch
import graft.ann.EncryptedSearch.{Config, SecurityLevel}

/** Mirrors encrypted_search.rs's tests (:246-313) and pins the LCG
  * hyperplane generator's wrapping-u64 arithmetic (a transcription of
  * the reference scheme — the same pinning style auto_embed uses for
  * its FNV-1a + LCG embedder).
  */
class EncryptedSearchSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (String, Seq[Float])*) = rows.toDF("id", "vec")

  test("LCG generator: deterministic, seed-sensitive, range-bounded, " +
      "and exactly the reference recurrence") {
    val a = EncryptedSearch.generateHyperplanes(4, 3, 42L)
    val b = EncryptedSearch.generateHyperplanes(4, 3, 42L)
    val c = EncryptedSearch.generateHyperplanes(4, 3, 43L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v >= -1f && v <= 1f))
    // first draw from seed 42, computed from the recurrence directly:
    // state = 42·6364136223846793005 + 1442695040888963407 (wrapping)
    val st = 42L * 6364136223846793005L + 1442695040888963407L
    val expected = ((st >>> 33).toFloat / 4294967295f) * 2.0f - 1.0f
    assert(a(0)(0) == expected)
  }

  test("encrypt + search: identical vector is the nearest, opposite is " +
      "the farthest (encrypted_search.rs:246-258)") {
    val planes = EncryptedSearch.generateHyperplanes(32, 16, 42L)
    val enc = EncryptedSearch.encrypt(
      frame("v1" -> Seq.fill(32)(1f), "v2" -> Seq.fill(32)(-1f)),
      col("id"), col("vec"), planes)
    val q = EncryptedSearch.encodeOne(Array.fill(32)(1f), planes)
    val r = EncryptedSearch.search(enc, q, totalBits = 16, k = 2).collect()
    assert(r(0).getString(0) == "v1")
    assert(r(0).getLong(1) == 0L)
    assert(r(0).getDouble(2) == 1.0)
    assert(r(1).getString(0) == "v2")
    assert(r(1).getLong(1) == 16L) // every sign flips for the negation
  }

  test("the encrypted frame carries no plaintext column") {
    val planes = EncryptedSearch.generateHyperplanes(4, 8, 1L)
    val enc = EncryptedSearch.encrypt(frame("a" -> Seq(1f, 2f, 3f, 4f)),
      col("id"), col("vec"), planes)
    assert(enc.columns.toSeq == Seq("id", "hash_codes", "original_norm"))
    val row = enc.collect()(0)
    assert(math.abs(row.getFloat(2) - math.sqrt(30).toFloat) < 1e-6f)
  }

  test("security presets match the reference table (:141-157, :63-69)") {
    assert(SecurityLevel.config(384, SecurityLevel.Standard) ==
      Config(384, 64, 2))
    assert(SecurityLevel.config(384, SecurityLevel.High) ==
      Config(384, 128, 4))
    assert(SecurityLevel.config(384, SecurityLevel.Maximum) ==
      Config(384, 256, 8))
    assert(SecurityLevel.config(32, SecurityLevel.Maximum) ==
      Config(32, 32, 8))
  }

  test("estimateAccuracy: the closed-form heuristic, capped at 0.99") {
    val lo = EncryptedSearch.estimateAccuracy(Config(8, 4, 1))
    assert(math.abs(lo - (1.0 - math.exp(-0.08)).toFloat) < 1e-6f)
    assert(EncryptedSearch.estimateAccuracy(Config(384, 128, 4)) == 0.99f)
  }

  test("codes pack little-endian across 64-bit words") {
    // 70 hyperplanes -> 2 words; all-ones vector against the identity-ish
    // family: bit j set iff dot >= 0
    val planes = EncryptedSearch.generateHyperplanes(8, 70, 7L)
    val codes = EncryptedSearch.encodeOne(Array.fill(8)(1f), planes)
    assert(codes.length == 2)
    val expected = planes.map(h => h.map(_.toDouble).sum >= 0.0)
    for (j <- 0 until 70)
      assert(((codes(j / 64) >>> (j % 64)) & 1L) ==
        (if (expected(j)) 1L else 0L), s"bit $j")
  }

  test("hamming search at moderate scale recovers a planted near-code " +
      "and plans no join") {
    val planes = EncryptedSearch.generateHyperplanes(16, 64, 42L)
    val base = spark.range(2000).select(col("id").cast("string").as("id"),
      transform(sequence(lit(0), lit(15)),
        i => ((hash(col("id") * 16 + i) % 1000) / 500.0).cast("float"))
        .as("vec"))
    val enc = EncryptedSearch.encrypt(base, col("id"), col("vec"), planes)
    val target = base.filter(col("id") === "1337")
      .select("vec").collect()(0).getSeq[Float](0).toArray
    val q = EncryptedSearch.encodeOne(target, planes)
    val top = EncryptedSearch.search(enc, q, totalBits = 64, k = 5)
    assert(top.collect()(0).getString(0) == "1337")
    val plan = top.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}
