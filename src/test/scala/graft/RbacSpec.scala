package graft

import org.apache.spark.sql.functions._

import graft.ops.Rbac._
import graft.ops.Rbac.Permission._

/** RBAC engine vs collection_rbac.rs: the decision walk (including its
  * allow-on-missing-policy and policy-disabled quirks), token expiry,
  * audit ring, the reference's own test scenarios, and the Spark-native
  * compiled predicate + column pruning.
  */
class RbacSpec extends SparkSpec {
  import spark.implicits._

  private def docs() = Seq(
    (1L, "en", "src1", 10L), (2L, "de", "src2", 20L),
    (3L, "en", "src2", 30L), (4L, "fr", "src3", 40L))
    .toDF("id", "lang", "source", "n")

  private def engine(now: Long = 100L): PolicyEngine = {
    val e = new PolicyEngine(() => now)
    e.addPolicy(RbacPolicy("docs")
      .addRule(PolicyRule("reader").allow(Read).allow(Search)
        .withRowFilter("lang", "en").withVisibleFields(Seq("lang")))
      .addRule(PolicyRule("curator").allow(Read).allow(Write)
        .withRowFilter("source", "src2")
        .withVisibleFields(Seq("lang", "source")))
      .addRule(PolicyRule("admin").allow(Admin).allow(Read)))
    e
  }

  test("reference walk: first matching rule decides; no policy and " +
      "disabled policy allow") {
    val e = engine()
    val reader = AccessToken("u1", Seq("reader"))
    assert(e.canRead("docs", reader) && e.canSearch("docs", reader))
    assert(!e.canWrite("docs", reader))
    val writer = AccessToken("u2", Seq("curator"))
    assert(e.canWrite("docs", writer))
    // no policy for the collection: allow, audited as no-policy
    assert(e.canRead("anything", AccessToken("u", Nil)))
    assert(e.auditLog.last.matchedRule.contains("no-policy"))
    // disabled policy: allow, audited as policy-disabled
    e.addPolicy(RbacPolicy("open").addRule(
      PolicyRule("x").allow(Read)).disabled)
    assert(e.canRead("open", AccessToken("u", Nil)))
    assert(e.auditLog.last.matchedRule.contains("policy-disabled"))
  }

  test("expired tokens deny everything and audit the denial") {
    val e = engine(now = 100L)
    val t = AccessToken("u", Seq("reader")).withExpiry(50L)
    assert(!e.canRead("docs", t))
    val a = e.auditLog.last
    assert(!a.granted && a.subject == "u")
    // unexpired passes
    assert(e.canRead("docs", AccessToken("u", Seq("reader"))
      .withExpiry(200L)))
  }

  test("rowFilters collects filters from every role the token holds") {
    val e = engine()
    val both = AccessToken("u", Seq("reader", "curator"))
    assert(e.rowFilters("docs", both).map(_.field) == Seq("lang", "source"))
    assert(RowFilter("lang", "en").matches(Map("lang" -> "en")))
    assert(!RowFilter("lang", "en").matches(Map("lang" -> "de")))
    assert(!RowFilter("lang", "en").matches(Map.empty))
  }

  test("readPredicate ORs matched rules, ANDs filters within a rule; " +
      "secureRead filters scan-side and prunes invisible fields") {
    val e = engine()
    // reader + curator: (lang = en) OR (source = src2) → ids 1, 2, 3
    val both = AccessToken("u", Seq("reader", "curator"))
    val got = e.secureRead(docs(), "docs", both,
      metadataCols = Seq("lang", "source", "n"))
    assert(got.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // visible fields = union {lang} ∪ {lang, source}: n is pruned
    assert(got.columns.toSeq == Seq("id", "lang", "source"))
    // admin's rule has no filters and no field restriction: whole
    // collection, all columns
    val admin = AccessToken("a", Seq("admin"))
    val all = e.secureRead(docs(), "docs", admin, Seq("lang", "source", "n"))
    assert(all.count() == 4 && all.columns.length == 4)
    // no matching rule: denied → empty with schema intact
    val none = e.secureRead(docs(), "docs", AccessToken("n", Seq("ghost")),
      Seq("lang", "source", "n"))
    assert(none.count() == 0 && none.columns.length == 4)
    // the predicate reaches the scan as a pushable filter (no UDF)
    val plan = e.secureRead(docs(), "docs", both, Nil)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }

  test("audit ring is bounded and ordered") {
    val e = new PolicyEngine(() => 7L)
    e.addPolicy(RbacPolicy("c").addRule(PolicyRule("r").allow(Read)))
    val t = AccessToken("s", Seq("r"))
    (1 to 10050).foreach(_ => e.canRead("c", t))
    assert(e.auditLog.size == 10000)
    assert(e.auditLog.forall(a => a.granted && a.timestamp == 7L))
    assert(e.policyCount == 1)
    assert(e.removePolicy("c") && !e.removePolicy("c"))
  }
}
