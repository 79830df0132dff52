package graft

import org.apache.spark.sql.functions._

/** Pinned recall ledger (VERDICT r18 item 5).
  *
  * The three recall self-checks (`ivf_recall`, `ivf_recall_clustered`,
  * `quantized_recall`) are `no_oracle` driver queries: the driver only
  * checks rows > 0, and their in-query `check_passed` floors are
  * deliberately loose reference-parity bands. Their MEASURED values have
  * been byte-identical for five rounds (r14-r18); this spec pins those
  * archived values the way the boundary lint pins fixtures, so a recall
  * regression fails `sbt test` instead of waiting for an eyeball diff of
  * the Verify dumps.
  *
  * Floors are asserted as >= (an IMPROVEMENT from a Spark upgrade
  * changing k-means tie-breaks must not red the suite); the archived
  * values being exact maxima today means any drop is a real regression.
  * Runs at sf0.01 — the scale the ledger values were measured at.
  */
class RecallLedgerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def measured(query: String): Map[Any, Double] =
    SparkEntry.queries(query)(spark, dir)
      .collect()
      .map(r => r.get(0) -> r.getDouble(1))
      .toMap

  // Ledger: measured at r14 and identical through r18 (VERDICT r18 §2.3;
  // re-read from the r19 Verify dump before pinning here).
  test("ivf_recall floors hold at the archived ledger values") {
    val m = measured("ivf_recall")
    assert(m(2) >= 0.6 - 1e-9, s"nprobe=2 recall ${m(2)} dropped below 0.6")
    assert(m(4) >= 0.9 - 1e-9, s"nprobe=4 recall ${m(4)} dropped below 0.9")
    assert(m(8) >= 1.0 - 1e-9, s"nprobe=8 (full probe) recall ${m(8)} " +
      "must be exact")
  }

  test("ivf_recall_clustered holds the reference-parity band at the ledger") {
    val m = measured("ivf_recall_clustered")
    // 2-of-16-cell probe on the clustered corpus: ledger value 1.0, the
    // published reference band is >= 0.95 (docs/benchmarks.md:51-54) —
    // pin the LEDGER, not just the band
    assert(m(2) >= 1.0 - 1e-9,
      s"clustered nprobe=2 recall ${m(2)} dropped below the archived 1.0")
    assert(m(16) >= 1.0 - 1e-9,
      s"clustered full probe recall ${m(16)} must be exact")
  }

  test("quantized rerank recalls hold at the archived ledger values") {
    val m = measured("quantized_recall")
    for (scheme <- Seq("sq8_rerank", "pq_adc_rerank", "binary_rerank"))
      assert(m(scheme) >= 1.0 - 1e-9,
        s"$scheme recall ${m(scheme)} dropped below the archived 1.0")
  }

  test("every recall self-check row still reports check_passed") {
    for (q <- Seq("ivf_recall", "ivf_recall_clustered", "quantized_recall")) {
      val failed = SparkEntry.queries(q)(spark, dir)
        .filter(!col("check_passed")).count()
      assert(failed == 0L, s"$q has $failed rows with check_passed=false")
    }
  }
}
