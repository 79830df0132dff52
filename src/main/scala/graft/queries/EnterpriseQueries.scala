package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Distances
import graft.ops.{Acl, Privacy, Tenancy}

/** Oracle-checked gates for the enterprise surface (reference
  * src/enterprise/): vector ACLs (row-level security as a compiled
  * pushed-down predicate), namespace/tenant usage accounting + GDPR
  * erasure (tenancy as partition pruning), and differentially-private
  * search (deterministic calibrated noise).
  *
  * Every gate routes through the REAL ops-layer path (AclEngine's
  * compiled predicate, Tenancy's aggregations, the PrivacyPolicyRegistry
  * budget + mechanism) — the SQL replays the semantics, the Scala
  * exercises the engine.
  */
object EnterpriseQueries {

  import Acl._
  import Acl.AclAction._
  import Acl.Effect._

  /** The gate's policy set, built fresh per call (the engine is mutable —
    * audit log — so sharing one across driver runs would be a hidden
    * ordering dependency). Exercises: priority ordering, first-match,
    * deny-over-allow at higher priority, principal filtering (the bob
    * policy must NOT fire for alice), id-prefix matching, and field-level
    * redaction.
    */
  private def gateEngine(): AclEngine = AclEngine()
    .addPolicy(AclPolicy("bob-all", PrincipalMatcher.UserId("bob"),
      ResourceMatcher.Any, Allow, Set(Search, Read), priority = 99))
    .addPolicy(AclPolicy("deny-src7", PrincipalMatcher.Any,
      ResourceMatcher.MetadataField("source", "src7"), Deny, Set(Search),
      priority = 10))
    .addPolicy(AclPolicy("allow-en", PrincipalMatcher.Role("analyst"),
      ResourceMatcher.MetadataField("lang", "en"), Allow, Set(Search),
      priority = 5))
    .addPolicy(AclPolicy("allow-id-3", PrincipalMatcher.Attribute("team", "ml"),
      ResourceMatcher.VectorId("3*"), Allow, Set(Search, Read), priority = 1))
    .addPolicy(AclPolicy("redact-text", PrincipalMatcher.Role("analyst"),
      ResourceMatcher.FieldName("text"), Deny, Set(Search), priority = 0))

  private val alice =
    RequestContext("alice", roles = Seq("analyst"),
      attributes = Map("team" -> "ml"))

  /** SQL for the deterministic uniform chain of `Privacy.uniform01` at a
    * given (possibly negative) `seed % m` remainder — the same Lehmer +
    * squaring steps as the Spark column, expressed as one scalar
    * expression over `vec_id`. The first mod is double-wrapped because
    * DuckDB's `%` is sign-preserving while Spark's `pmod` is not.
    */
  private def unifSql(seedRem: Long): String = {
    val m = 2147483647L
    val s0 = s"((((vec_id % $m) * 48271 + $seedRem) % $m + $m) % $m)"
    val s1 = s"((($s0 + 1) * 48271) % $m)"
    val sq = s"((($s1 * $s1 + $s1)) % $m)"
    val s2 = s"((($sq + 1) * 48271) % $m)"
    s"((CAST($s2 AS DOUBLE) + 0.5) / $m.0)"
  }

  /** Gaussian dp gate constants — computed once so the Spark config and
    * the embedded SQL literals cannot drift apart.
    */
  private val gaussEps = 2.0
  private val gaussDelta = 1e-5
  private val gaussSens = 0.05
  private val gaussSeed = 11L
  private val gaussSigma =
    gaussSens * math.sqrt(2.0 * math.log(1.25 / gaussDelta)) / gaussEps
  private val gaussSeedB =
    (gaussSeed + 0x9e3779b97f4a7c15L) % 2147483647L // sign-preserving, as in Scala

  val defs: Map[String, Q] = Map(
    // ACL-enforced search (vector_acl.rs:259-357): the priority-ordered
    // first-match policy walk compiled to a CASE chain, applied before
    // scoring (predicate pushdown), field-level deny applied as column
    // pruning. For alice (role analyst, team ml) the walk is:
    //   source='src7' -> deny | lang='en' -> allow | id LIKE '3%' -> allow
    //   | default deny    (bob-all drops out at principal match time).
    // The oracle replays the same CASE chain; the `text` redaction is
    // structural (the column never appears) and is asserted in AclSpec.
    "acl_search" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |allowed AS (
        |  SELECT CAST(d.doc_id AS VARCHAR) AS id, d.lang, d.source, e.embedding
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |  WHERE (CASE WHEN d.source = 'src7' THEN FALSE
        |              WHEN d.lang = 'en' THEN TRUE
        |              WHEN CAST(d.doc_id AS VARCHAR) LIKE '3%' THEN TRUE
        |              ELSE FALSE END)
        |)
        |SELECT id, round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance,
        |       lang, source
        |FROM allowed, q
        |ORDER BY distance, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val coll = docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(docs("doc_id").cast("string").as("id"), col("lang"),
          col("source"), col("text"), col("embedding"))
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val engine = gateEngine()
      val pred = engine.searchPredicate(alice, Search, col("id"), col(_))
      val pruned = engine.redactedFields(alice, Search)
        .foldLeft(coll.filter(pred))(_ drop _)
      pruned.crossJoin(broadcast(qv))
        .select(col("id"),
          round(Distances.cosine(col("embedding"), col("qv")), 6)
            .as("distance"),
          col("lang"), col("source"))
        .orderBy(col("distance").asc, col("id").asc)
        .limit(10)
    },

    // Per-tenant usage + remaining quota (namespace.rs:420-458): the
    // tenant is a partition-column value (synthesized here as
    // doc-id mod 4), usage is one map-side-combined aggregation, quota
    // remainder is arithmetic over it. All columns BIGINT/VARCHAR.
    "tenant_usage" -> Q(
      """SELECT 't' || CAST(vec_id % 4 AS VARCHAR) AS tenant_id,
        |       count(*) AS total_vectors,
        |       CAST(sum(len(embedding) * 4 + 100) AS BIGINT) AS total_storage_bytes,
        |       greatest(0, 150 - count(*)) AS remaining_vectors,
        |       CAST(greatest(0, 200000 - sum(len(embedding) * 4 + 100)) AS BIGINT) AS remaining_storage_bytes
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
        .withColumn("tenant",
          concat(lit("t"), pmod(col("vec_id"), lit(4L)).cast("string")))
      Tenancy.withRemainingQuota(
          Tenancy.usageByTenant(emb, "tenant", "embedding"),
          maxVectors = Some(150L), maxStorageBytes = Some(200000L))
        .orderBy(col("tenant_id").asc)
    },

    // GDPR erasure (tenant_isolation.rs:421-441): drop tenant t2's
    // partition, fingerprint what remains per tenant. On a
    // tenant-partitioned lake the delete rewrites only t2's files.
    "gdpr_delete" -> Q(
      // doc 900002 is PLANTED with a NULL tenant (r17 mutation-audit
      // finding: every derived tenant was non-null, so the null-SAFETY of
      // the erasure filter — =!= alone silently drops null-tenant rows —
      // was unobservable). Erasing t2 must keep it; it groups as 'none'.
      """WITH docs AS (
        |  SELECT doc_id, 't' || CAST(doc_id % 4 AS VARCHAR) AS tenant
        |  FROM documents
        |  UNION ALL SELECT 900002, NULL),
        |kept AS (SELECT * FROM docs WHERE tenant IS NULL OR tenant <> 't2')
        |SELECT coalesce(tenant, 'none') AS tenant_id,
        |       count(*) AS n_docs,
        |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .withColumn("tenant",
          concat(lit("t"), pmod(col("doc_id"), lit(4L)).cast("string")))
        .select(col("doc_id"), col("tenant"))
        .unionAll(s.range(1).select(lit(900002L).as("doc_id"),
          lit(null).cast("string").as("tenant")))
      Tenancy.gdprDelete(docs, "tenant", "t2")
        .groupBy(coalesce(col("tenant"), lit("none")).as("tenant_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_doc_id"))
        .orderBy(col("tenant_id").asc)
    },

    // Differentially-private search (privacy.rs:159-231): exact cosine
    // distances perturbed with deterministic calibrated Laplace noise
    // (MINSTD uniforms -> inverse CDF), re-ranked on the noisy distance.
    // Budget is consumed through the registry (enforced policy). Both
    // engines derive the identical noise from pure integer arithmetic;
    // distance and noise are 6-decimal-rounded before the sum (repo
    // oracle convention), so the hashed surface is reproducible.
    "dp_search" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id,
        |         round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS d
        |  FROM embeddings, q
        |),
        |noised AS (
        |  SELECT vec_id, d,
        |         (((((vec_id % 2147483647) * 48271 + 7) % 2147483647 + 1) * 48271) % 2147483647) AS s1
        |  FROM scored
        |),
        |noised2 AS (
        |  SELECT vec_id, d,
        |         ((((s1 * s1 + s1) % 2147483647) + 1) * 48271) % 2147483647 AS s2
        |  FROM noised
        |),
        |unif AS (
        |  SELECT vec_id, d,
        |         (CAST(s2 AS DOUBLE) + 0.5) / 2147483647.0 AS u
        |  FROM noised2
        |),
        |lap AS (
        |  SELECT vec_id, d,
        |         round(-0.1 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise
        |  FROM unif
        |)
        |SELECT vec_id, round(greatest(0.0, d + noise), 6) AS noisy_distance
        |FROM lap
        |ORDER BY greatest(0.0, d + noise), vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val registry = new Privacy.PrivacyPolicyRegistry
      registry.register(Privacy.CollectionPrivacyPolicy("embeddings",
        Privacy.PrivacyConfig(epsilon = 1.0, sensitivity = 0.1)))
      registry.privateSearch("embeddings", "driver-session",
          emb.crossJoin(broadcast(qv)), col("embedding"), col("qv"),
          k = 10, seed = 7, idCol = "vec_id", roundTo = Some(6))
        .select(col("vec_id"),
          round(col("noisy_distance"), 6).as("noisy_distance"))
    },

    // The GAUSSIAN mechanism end-to-end (privacy.rs:197-207 Box-Muller):
    // two decorrelated deterministic uniforms -> z = sqrt(-2 ln u1) *
    // cos(2*pi*u2) * sigma. Sigma and the second seed are computed ONCE
    // in Scala and embedded as exact double/integer literals, so the
    // config and the oracle cannot drift.
    "dp_search_gaussian" -> Q(
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |scored AS (
         |  SELECT vec_id,
         |         round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS d
         |  FROM embeddings, q
         |),
         |unif AS (
         |  SELECT vec_id, d,
         |         ${unifSql(gaussSeed % 2147483647L)} AS u1,
         |         ${unifSql(gaussSeedB)} AS u2
         |  FROM scored
         |),
         |gz AS (
         |  SELECT vec_id, d,
         |         round(sqrt(-2.0 * ln(u1)) * cos(6.283185307179586 * u2) * $gaussSigma, 6) AS noise
         |  FROM unif
         |)
         |SELECT vec_id, round(greatest(0.0, d + noise), 6) AS noisy_distance
         |FROM gz
         |ORDER BY greatest(0.0, d + noise), vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val registry = new Privacy.PrivacyPolicyRegistry
      registry.register(Privacy.CollectionPrivacyPolicy("embeddings",
        Privacy.PrivacyConfig(epsilon = gaussEps, delta = gaussDelta,
          sensitivity = gaussSens,
          mechanism = Privacy.NoiseMechanism.Gaussian)))
      registry.privateSearch("embeddings", "driver-session",
          emb.crossJoin(broadcast(qv)), col("embedding"), col("qv"),
          k = 10, seed = gaussSeed, idCol = "vec_id", roundTo = Some(6))
        .select(col("vec_id"),
          round(col("noisy_distance"), 6).as("noisy_distance"))
    })
}
