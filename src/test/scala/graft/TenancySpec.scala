package graft

import org.apache.spark.sql.functions._

import graft.ops.Tenancy
import graft.ops.Tenancy._

/** Namespaces / multi-tenancy (reference src/enterprise/namespace.rs +
  * tenant_isolation.rs): lifecycle, quota enforcement, usage accounting
  * (driver counters must agree with the distributed aggregation), scoped
  * views with partition pruning, GDPR export/delete.
  */
class TenancySpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dims: Int = 4) =
    (0 until n).map(i => (s"v$i", Array.fill(dims)(i.toFloat)))
      .toDF("id", "embedding")

  test("namespace lifecycle: create, list, suspend, resume, delete") {
    val mgr = new NamespaceManager(spark)
    mgr.now = () => 1L
    val ns = mgr.createNamespace("acme")
    assert(mgr.listNamespaces == Seq("acme"))
    intercept[IllegalArgumentException](mgr.createNamespace("acme"))
    mgr.suspendTenant("acme")
    intercept[IllegalStateException](mgr.namespace("acme"))
    mgr.resumeTenant("acme")
    assert(mgr.namespace("acme").id == "acme")
    assert(mgr.deleteNamespace("acme") && !mgr.deleteNamespace("acme"))
    assert(mgr.auditLog("acme").map(_.action) ==
      Seq("create_namespace", "suspend", "resume", "delete_namespace"))
    assert(ns.usageReport.tenantId == "acme")
  }

  test("collection quotas: maxCollections, maxDimensions, duplicate name") {
    val mgr = new NamespaceManager(spark)
    val ns = mgr.createNamespace("t1",
      TenantConfig(maxCollections = Some(2), maxDimensions = Some(8)))
    ns.createCollection("a", 4)
    intercept[QuotaExceeded](ns.createCollection("big", 16))
    ns.createCollection("b", 4)
    intercept[QuotaExceeded](ns.createCollection("c", 4))
    intercept[IllegalArgumentException](ns.createCollection("a", 4))
    assert(ns.listCollections == Seq("a", "b") && ns.hasCollection("a"))
  }

  test("vector quota + storage estimate + usage report") {
    val mgr = new NamespaceManager(spark)
    val ns = mgr.createNamespace("t2",
      TenantConfig(maxVectors = Some(5), maxCollections = None))
    ns.createCollection("c", dims = 4)
    ns.insertBatch("c", vecs(3))
    assert(ns.usageReport.totalVectors == 3)
    assert(ns.usageReport.totalStorageBytes == 3 * Tenancy.storageEstimate(4))
    intercept[QuotaExceeded](ns.insertBatch("c", vecs(3)))
    ns.insertBatch("c", vecs(2).withColumn("id", concat(lit("w"), col("id"))))
    assert(ns.collection("c").count() == 5)
    intercept[QuotaExceeded](ns.checkVectorQuota())
  }

  test("storage quota is pre-emptive: a batch cannot overshoot maxStorageBytes") {
    val mgr = new NamespaceManager(spark)
    val perRow = Tenancy.storageEstimate(4)
    // room for exactly 4 rows; the namespace is UNDER the byte quota
    // after 3, so the old post-hoc check (storageBytes >= m) would have
    // admitted an arbitrarily large 4th batch
    val ns = mgr.createNamespace("t3", TenantConfig(
      maxCollections = None, maxVectors = None,
      maxStorageBytes = Some(perRow * 4), maxDimensions = None))
    ns.createCollection("c", dims = 4)
    ns.insertBatch("c", vecs(3))
    intercept[QuotaExceeded](ns.insertBatch("c",
      vecs(2).withColumn("id", concat(lit("w"), col("id")))))
    assert(ns.collection("c").count() == 3)
    // a batch that fits exactly still lands
    ns.insertBatch("c", vecs(1).withColumn("id", concat(lit("w"), col("id"))))
    assert(ns.collection("c").count() == 4)
  }

  test("read-only namespace refuses writes; search still works") {
    val mgr = new NamespaceManager(spark)
    val ns = mgr.createNamespace("ro", TenantConfig.unlimited)
    ns.createCollection("c", 4, initial = Some(vecs(4)))
    val roNs = mgr.createNamespace("ro2", TenantConfig.readOnly)
    intercept[IllegalStateException](roNs.createCollection("c", 4))
    val res = ns.search("c", lit(Array(1f, 1f, 1f, 1f)), k = 2)
    assert(res.count() == 2)
    assert(ns.usageReport.totalQueries == 1)
  }

  test("upsert through the namespace replaces rather than duplicates") {
    val mgr = new NamespaceManager(spark)
    val ns = mgr.createNamespace("t3", TenantConfig.unlimited)
    ns.createCollection("c", 4, initial = Some(vecs(3)))
    ns.insertBatch("c", Seq(("v1", Array(9f, 9f, 9f, 9f)))
      .toDF("id", "embedding"))
    val c = ns.collection("c")
    assert(c.count() == 3)
    assert(c.filter(col("id") === "v1").head.getSeq[Float](1).head == 9f)
  }

  test("token-bucket rate limit: exhausts, then refills with the clock") {
    val mgr = new NamespaceManager(spark)
    var clock = 1000L
    mgr.now = () => clock
    val ns = mgr.createNamespace("rl",
      TenantConfig.unlimited.copy(rateLimitOps = Some(2)))
    ns.createCollection("c", 4, initial = Some(vecs(4)))
    ns.search("c", lit(Array(1f, 1f, 1f, 1f)), k = 1).count()
    ns.search("c", lit(Array(1f, 1f, 1f, 1f)), k = 1).count()
    intercept[QuotaExceeded](ns.search("c", lit(Array(1f, 1f, 1f, 1f)), k = 1))
    clock += 1 // one second -> 2 tokens refilled
    ns.search("c", lit(Array(1f, 1f, 1f, 1f)), k = 1).count()
  }

  test("usageByTenant agrees with per-namespace driver counters") {
    val df = vecs(12).withColumn("tenant",
      concat(lit("t"), pmod(abs(hash(col("id"))), lit(3)).cast("string")))
    val usage = Tenancy.usageByTenant(df, "tenant", "embedding")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byTenant = df.groupBy("tenant").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(usage.keySet == byTenant.keySet)
    byTenant.foreach { case (t, n) =>
      assert(usage(t) == ((n, n * Tenancy.storageEstimate(4))))
    }
  }

  test("withRemainingQuota: clamped at zero, NULL when unlimited") {
    val usage = Seq(("t0", 10L, 1000L), ("t1", 200L, 50000L))
      .toDF("tenant_id", "total_vectors", "total_storage_bytes")
    val r = Tenancy.withRemainingQuota(usage, Some(100L), None)
      .orderBy("tenant_id").collect()
    assert(r(0).getLong(3) == 90L && r(1).getLong(3) == 0L)
    assert(r(0).isNullAt(4) && r(1).isNullAt(4))
  }

  test("scopedView prunes partitions on a tenant-partitioned lake") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("tenantlake").toString
    vecs(20).withColumn("tenant",
        concat(lit("t"), pmod(abs(hash(col("id"))), lit(4)).cast("string")))
      .write.mode("overwrite").partitionBy("tenant").parquet(dir)
    val lake = spark.read.parquet(dir)
    val scoped = Tenancy.scopedView(lake, "tenant", "t1")
    val plan = scoped.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("tenant"), s"expected partition pruning in:\n$plan")
    assert(scoped.select("tenant").distinct().as[String].collect()
      .forall(_ == "t1"))
  }

  test("gdprExport + gdprDelete partition the lake exactly") {
    val df = vecs(10).withColumn("tenant",
      concat(lit("t"), pmod(abs(hash(col("id"))), lit(2)).cast("string")))
    val exported = Tenancy.gdprExport(df, "tenant", "t0")
    val remaining = Tenancy.gdprDelete(df, "tenant", "t0")
    assert(exported.count() + remaining.count() == 10)
    assert(remaining.filter(col("tenant") === "t0").count() == 0)
    // null tenants survive a delete (they belong to no tenant)
    val withNull = df.withColumn("tenant",
      when(col("id") === "v0", lit(null)).otherwise(col("tenant")))
    assert(Tenancy.gdprDelete(withNull, "tenant", "t1")
      .filter(col("tenant").isNull).count() ==
      withNull.filter(col("tenant").isNull).count())
  }
}
