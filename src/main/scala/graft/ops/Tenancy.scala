package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Namespaces, multi-tenancy, and quotas (reference:
  * src/enterprise/namespace.rs, src/enterprise/tenant_isolation.rs).
  *
  * The reference isolates tenants by prefixing collection names inside one
  * single-node database and guards every operation with atomic-counter
  * quotas (namespace.rs:420-545). Spark-first, tenancy is a LAYOUT
  * property: a tenant is a value of a partition column of the lake table,
  * so a namespace-scoped view is `filter(tenant_col = id)` — partition
  * pruning makes the scoped scan touch only that tenant's files, which is
  * what makes isolation free at 100 TB (a 1-GB tenant inside a 100-TB
  * lake reads 1 GB, not 100 TB). Quota accounting is the same
  * aggregation the usage report runs ([[Tenancy.usageByTenant]]), so
  * "enforce" and "report" cannot drift apart.
  *
  * The driver-side [[NamespaceManager]] mirrors the reference manager's
  * lifecycle surface (create/suspend/delete/list, read-only mode, GDPR
  * export/delete, audit) over registered DataFrame-backed collections.
  */
object Tenancy {

  /** namespace.rs:36-88. */
  final case class TenantConfig(maxCollections: Option[Int] = Some(100),
                                maxVectors: Option[Long] = Some(1000000L),
                                maxStorageBytes: Option[Long] =
                                  Some(10L * 1024 * 1024 * 1024),
                                maxDimensions: Option[Int] = Some(4096),
                                rateLimitOps: Option[Int] = None,
                                readOnly: Boolean = false)
  object TenantConfig {
    def unlimited: TenantConfig =
      TenantConfig(None, None, None, None, None, readOnly = false)
    def readOnly: TenantConfig = TenantConfig(readOnly = true)
  }

  /** namespace.rs:440-458. */
  final case class TenantUsageReport(tenantId: String,
                                     totalVectors: Long,
                                     totalCollections: Long,
                                     totalStorageBytes: Long,
                                     totalQueries: Long,
                                     totalWrites: Long)

  final case class QuotaExceeded(message: String)
      extends RuntimeException(message)

  /** Per-vector storage estimate (namespace.rs:529: 4 bytes per float +
    * fixed overhead). Kept as the reference's formula so usage reports
    * are comparable across engines.
    */
  def storageEstimate(dims: Int): Long = dims.toLong * 4 + 100

  /** Namespace-scoped view of a tenant-partitioned lake table: a plain
    * equality filter, so Catalyst prunes to the tenant's partitions.
    */
  def scopedView(df: DataFrame, tenantCol: String, tenantId: String): DataFrame =
    df.filter(col(tenantCol) === tenantId)

  /** Per-tenant usage over a tenant-partitioned collection — one
    * map-side-combined aggregation pass, grouped by the partition column
    * (no skew concern: group count == tenant count). `vecCol` sizes the
    * storage estimate per row from its own length, so mixed-dimension
    * collections report honestly.
    */
  def usageByTenant(df: DataFrame, tenantCol: String,
                    vecCol: String): DataFrame =
    df.groupBy(col(tenantCol).cast("string").as("tenant_id"))
      .agg(count(lit(1)).as("total_vectors"),
           sum(size(col(vecCol)).cast("long") * 4L + 100L)
             .as("total_storage_bytes"))

  /** Remaining-quota projection over a usage report: how many vectors and
    * bytes each tenant may still write (NULL = unlimited).
    */
  def withRemainingQuota(usage: DataFrame, maxVectors: Option[Long],
                         maxStorageBytes: Option[Long]): DataFrame = {
    val remV = maxVectors
      .map(m => greatest(lit(0L), lit(m) - col("total_vectors")))
      .getOrElse(lit(null).cast("long"))
    val remB = maxStorageBytes
      .map(m => greatest(lit(0L), lit(m) - col("total_storage_bytes")))
      .getOrElse(lit(null).cast("long"))
    usage.withColumn("remaining_vectors", remV)
      .withColumn("remaining_storage_bytes", remB)
  }

  /** GDPR data export (tenant_isolation.rs:401-420): every row the tenant
    * owns — a partition-pruned scan, ready for `Interchange.exportJsonl`.
    */
  def gdprExport(df: DataFrame, tenantCol: String, tenantId: String): DataFrame =
    scopedView(df, tenantCol, tenantId)

  /** GDPR erasure (tenant_isolation.rs:421-441): drop the tenant's
    * partition. On a partitioned lake this rewrites only that tenant's
    * files; expressed declaratively it is the complement filter.
    */
  def gdprDelete(df: DataFrame, tenantCol: String, tenantId: String): DataFrame =
    df.filter(col(tenantCol) =!= tenantId || col(tenantCol).isNull)

  final case class AuditLogEntry(timestamp: Long, tenantId: String,
                                 action: String, detail: String)

  /** Token-bucket per-tenant rate limiter (namespace.rs:143-190):
    * capacity = refill rate = `ops` per second, continuous refill.
    * The clock is injectable so specs are deterministic.
    */
  final class TokenBucketRateLimiter(ops: Int, nowMillis: () => Long) {
    private var tokens: Double = ops.toDouble
    private var lastRefill: Long = nowMillis()

    def tryAcquire(): Boolean = synchronized {
      val t = nowMillis()
      tokens = math.min(ops.toDouble,
        tokens + (t - lastRefill) / 1000.0 * ops)
      lastRefill = t
      if (tokens >= 1.0) { tokens -= 1.0; true } else false
    }

    def availableTokens: Int = synchronized {
      val t = nowMillis()
      math.min(ops.toDouble, tokens + (t - lastRefill) / 1000.0 * ops).toInt
    }
  }

  /** One tenant's collections + quota guards (namespace.rs:300-545).
    * Collections are DataFrame-backed; mutations go through the same
    * declarative ops as the rest of the engine (`Mutations`), with the
    * namespace layer adding quota checks and stats.
    */
  final class Namespace private[Tenancy] (val id: String,
                                          val config: TenantConfig,
                                          manager: NamespaceManager) {
    /** name -> (data, dims, row count). The count rides in the registry
      * so quota checks and usage reports never re-scan, and an upsert
      * that replaces rows adjusts by the TRUE delta.
      */
    private val collections =
      mutable.LinkedHashMap.empty[String, (DataFrame, Int, Long)]
    private var vectors = 0L
    private var storageBytes = 0L
    private var searches = 0L
    private var writes = 0L
    private val rateLimiter = config.rateLimitOps
      .map(ops => new TokenBucketRateLimiter(ops, () => manager.now() * 1000L))

    private def checkRateLimit(): Unit =
      rateLimiter.foreach { l =>
        if (!l.tryAcquire()) throw QuotaExceeded("Rate limit exceeded")
      }

    def createCollection(name: String, dims: Int,
                         initial: Option[DataFrame] = None): Unit =
      synchronized {
        checkWriteAccess()
        // duplicate name is an input error, reported before quota state
        require(!collections.contains(name), s"Collection '$name' exists")
        config.maxCollections.foreach { m =>
          if (collections.size >= m)
            throw QuotaExceeded(s"Collection quota exceeded: ${collections.size}/$m")
        }
        config.maxDimensions.foreach { m =>
          if (dims > m)
            throw QuotaExceeded(s"Dimension limit exceeded: $dims > $m")
        }
        val df = initial.getOrElse(manager.spark.emptyDataFrame)
        val n = initial.map(_.count()).getOrElse(0L)
        if (n > 0) checkVectorQuota(n, dims) // seeded rows count like inserts
        collections.put(name, (df, dims, n))
        vectors += n
        storageBytes += n * storageEstimate(dims)
        manager.logAudit(id, "create_collection", name)
      }

    def collection(name: String): DataFrame = synchronized {
      collections.getOrElse(name,
        throw new NoSuchElementException(s"Collection '$name' not found"))._1
    }

    def deleteCollection(name: String): Boolean = synchronized {
      checkWriteAccess()
      val removed = collections.remove(name)
      removed.foreach { case (_, dims, n) =>
        vectors -= n
        storageBytes -= n * storageEstimate(dims)
      }
      manager.logAudit(id, "delete_collection", name)
      removed.isDefined
    }

    def listCollections: Seq[String] = synchronized(collections.keys.toSeq)
    def hasCollection(name: String): Boolean =
      synchronized(collections.contains(name))

    /** namespace.rs:426-437. Both limits are pre-emptive: the storage
      * check projects the batch's byte delta (`toAdd · estimate(dims)`)
      * rather than only testing the pre-insert total, so one large batch
      * cannot overshoot `maxStorageBytes` from just under the line.
      * `dims = 0` (unknown) still charges the 100-byte/row floor.
      */
    def checkVectorQuota(toAdd: Long = 1, dims: Int = 0): Unit =
      synchronized {
        config.maxVectors.foreach { m =>
          if (vectors + toAdd > m)
            throw QuotaExceeded(s"Vector quota exceeded: $vectors+$toAdd/$m")
        }
        config.maxStorageBytes.foreach { m =>
          val projected = storageBytes + toAdd * storageEstimate(dims)
          if (projected > m)
            throw QuotaExceeded(
              s"Storage quota exceeded: $storageBytes+${toAdd * storageEstimate(dims)}/$m")
        }
      }

    /** Quota-guarded batch insert (the bulk path — namespace.rs:495-531
      * per-row insert scaled to a DataFrame batch): delegates to the
      * declarative upsert, then advances the maintained counters.
      */
    def insertBatch(name: String, rows: DataFrame, idCol: String = "id"): Unit =
      synchronized {
        checkWriteAccess()
        checkRateLimit()
        val n = rows.count()
        val (df, dims, oldCount) = collections(name)
        checkVectorQuota(n, dims) // conservative: treats every row as new
        val merged =
          if (oldCount == 0) rows else Mutations.upsert(df, rows, idCol)
        val newCount = merged.count()
        collections.put(name, (merged, dims, newCount))
        vectors += newCount - oldCount
        storageBytes += (newCount - oldCount) * storageEstimate(dims)
        writes += n
        manager.logAudit(id, "insert_batch", s"$name:$n")
      }

    /** Scoped search: the namespace only ever scans its own collections. */
    def search(name: String, query: Column, k: Int,
               vecCol: String = "embedding", idCol: String = "id",
               metric: String = "cosine"): DataFrame = synchronized {
      checkRateLimit()
      searches += 1
      Search.topK(collection(name), col(vecCol), query, k, metric, idCol)
    }

    def usageReport: TenantUsageReport = synchronized {
      TenantUsageReport(id, vectors, collections.size.toLong, storageBytes,
        searches, writes)
    }

    private def checkWriteAccess(): Unit =
      if (config.readOnly)
        throw new IllegalStateException("Namespace is read-only")
  }

  /** Tenant lifecycle (namespace.rs:613-660 + tenant_isolation.rs manager
    * surface: suspend, audit, GDPR).
    */
  final class NamespaceManager(val spark: SparkSession,
                               defaultConfig: TenantConfig = TenantConfig()) {
    private val namespaces = mutable.LinkedHashMap.empty[String, Namespace]
    private val suspended = mutable.Set.empty[String]
    private val audit = mutable.ArrayBuffer.empty[AuditLogEntry]
    /** Injectable clock for deterministic specs. */
    var now: () => Long = () => System.currentTimeMillis() / 1000L

    def createNamespace(id: String,
                        config: TenantConfig = defaultConfig): Namespace =
      synchronized {
        require(id.nonEmpty, "Namespace id cannot be empty")
        require(!namespaces.contains(id), s"Namespace '$id' exists")
        val ns = new Namespace(id, config, this)
        namespaces.put(id, ns)
        logAudit(id, "create_namespace", "")
        ns
      }

    def namespace(id: String): Namespace = synchronized {
      if (suspended.contains(id))
        throw new IllegalStateException(s"Tenant '$id' is suspended")
      namespaces.getOrElse(id,
        throw new NoSuchElementException(s"Namespace '$id' not found"))
    }

    def suspendTenant(id: String): Unit = synchronized {
      require(namespaces.contains(id), s"Namespace '$id' not found")
      suspended += id
      logAudit(id, "suspend", "")
    }

    def resumeTenant(id: String): Unit = synchronized {
      suspended -= id
      logAudit(id, "resume", "")
    }

    def deleteNamespace(id: String): Boolean = synchronized {
      val removed = namespaces.remove(id).isDefined
      if (removed) {
        suspended -= id
        logAudit(id, "delete_namespace", "")
      }
      removed
    }

    def listNamespaces: Seq[String] = synchronized(namespaces.keys.toSeq)
    def namespaceCount: Int = synchronized(namespaces.size)

    private[Tenancy] def logAudit(tenant: String, action: String,
                                  detail: String): Unit = synchronized {
      audit += AuditLogEntry(now(), tenant, action, detail)
    }

    def auditLog(tenant: String): Seq[AuditLogEntry] =
      synchronized(audit.filter(_.tenantId == tenant).toSeq)
  }
}
