package graft

/** Complement of [[PlanAuditSpec]]: every declared driver query WITHOUT a
  * per-name audit there is planned at sf0.001 and must not contain a
  * CartesianProduct. Together the two specs cover `SparkEntry.all`
  * totally by construction — a new query is swept by default the moment
  * it is declared, and can only leave the sweep by being adjudicated
  * into [[PlanAuditLedger]]'s named lists. (BroadcastNestedLoopJoin is
  * legal here: most swept queries ride a 1-row broadcast query-vector or
  * corpus-stats frame — the per-shape BNLJ adjudications stay in
  * PlanAuditSpec; this sweep is the cartesian backstop.)
  *
  * Like the other ledgers, the allowlist pins BOTH ways: an allowlisted
  * query must still plan its adjudicated cartesian, so a stale entry
  * fails until retired.
  */
class PlanSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** adjudicated cartesians: name -> why the shape is definitional */
  private val allowCartesian: Map[String, String] = Map.empty

  private val swept: Seq[String] =
    (SparkEntry.all.keySet -- PlanAuditLedger.named).toSeq.sorted

  test("ledger freshness: every named audit entry is a declared query") {
    val stale = PlanAuditLedger.named -- SparkEntry.all.keySet
    assert(stale.isEmpty, s"retired queries still named in the ledger: $stale")
  }

  for (name <- swept if !allowCartesian.contains(name))
    test(s"$name (swept) plans no cartesian product") {
      val plan = SparkEntry.all(name).fn(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — rewrite it or adjudicate it " +
          s"into allowCartesian/PlanAuditLedger:\n$plan")
    }

  for ((name, why) <- allowCartesian.toSeq.sortBy(_._1))
    test(s"$name (allowlisted: $why) still plans its adjudicated cartesian") {
      assume(swept.contains(name),
        s"$name moved into PlanAuditLedger — retire its allowlist entry")
      val plan = SparkEntry.all(name).fn(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("CartesianProduct"),
        s"stale allowlist entry: $name no longer plans a cartesian")
    }
}
