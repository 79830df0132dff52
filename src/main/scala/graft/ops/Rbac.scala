package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collection-level RBAC (reference:
  * src/services/collection/collection_rbac.rs): per-collection policies
  * of role → permission rules with row-level filters and field-level
  * visibility, expiring access tokens, and a bounded audit log.
  *
  * The driver-side [[Rbac.PolicyEngine.check]] walk reproduces the
  * reference exactly: expired token → deny; missing policy → allow
  * ("no-policy"); disabled policy → allow ("policy-disabled"); else the
  * FIRST rule in declaration order whose role the token holds and whose
  * permission set contains the requested permission decides; every
  * decision lands in a 10k-entry audit ring.
  *
  * Spark re-expression of the data path: the reference's `row_filters()`
  * hands per-row filters to a callback loop; here
  * [[Rbac.PolicyEngine.readPredicate]] compiles the SAME rule walk into
  * ONE Catalyst predicate — a rule's filters AND together
  * (collection_rbac.rs:95 "all must match"), rules a token holds OR
  * together — which pushes into the parquet scan, so row-level security
  * prunes row-groups instead of evaluating per row on the driver.
  * Field-level visibility ([[Rbac.PolicyEngine.visibleMetadataFields]])
  * becomes column pruning: the scan never reads a field no matched rule
  * exposes. The reference leaves both combination semantics to its host;
  * the choices here (OR across matched rules' row filters, union of
  * their visible fields — a subject with two roles sees what either
  * grants) are the standard RBAC reading and are spec-pinned.
  */
object Rbac {

  sealed trait Permission { def name: String }
  object Permission {
    case object Read extends Permission { val name = "read" }
    case object Write extends Permission { val name = "write" }
    case object Update extends Permission { val name = "update" }
    case object Delete extends Permission { val name = "delete" }
    case object Search extends Permission { val name = "search" }
    case object Admin extends Permission { val name = "admin" }
  }

  /** Metadata equality filter (collection_rbac.rs:71-84); `value` is a
    * String/Long/Double/Boolean literal.
    */
  final case class RowFilter(field: String, value: Any) {
    def matches(metadata: Map[String, Any]): Boolean =
      metadata.get(field).contains(value)
  }

  final case class PolicyRule(role: String,
                              permissions: Set[Permission] = Set.empty,
                              rowFilters: Seq[RowFilter] = Nil,
                              visibleFields: Seq[String] = Nil) {
    def allow(p: Permission): PolicyRule = copy(permissions = permissions + p)
    def withRowFilter(field: String, value: Any): PolicyRule =
      copy(rowFilters = rowFilters :+ RowFilter(field, value))
    def withVisibleFields(fields: Seq[String]): PolicyRule =
      copy(visibleFields = fields)
  }

  final case class RbacPolicy(collection: String,
                              rules: Vector[PolicyRule] = Vector.empty,
                              enabled: Boolean = true) {
    def addRule(r: PolicyRule): RbacPolicy = copy(rules = rules :+ r)
    def disabled: RbacPolicy = copy(enabled = false)
  }

  final case class AccessToken(subject: String, roles: Seq[String],
                               expiresAt: Option[Long] = None) {
    def isExpired(now: Long): Boolean = expiresAt.exists(_ <= now)
    def hasRole(role: String): Boolean = roles.contains(role)
    def withExpiry(at: Long): AccessToken = copy(expiresAt = Some(at))
  }

  final case class AuditEntry(subject: String, collection: String,
                              permission: String, granted: Boolean,
                              timestamp: Long, matchedRule: Option[String])

  final class PolicyEngine(val now: () => Long =
      () => System.currentTimeMillis() / 1000L) {
    private val policies = mutable.LinkedHashMap.empty[String, RbacPolicy]
    private val audit = mutable.ArrayDeque.empty[AuditEntry]
    private val maxAudit = 10000

    def addPolicy(p: RbacPolicy): this.type =
      synchronized { policies(p.collection) = p; this }
    def removePolicy(collection: String): Boolean =
      synchronized { policies.remove(collection).isDefined }
    def policyCount: Int = synchronized(policies.size)
    def auditLog: Seq[AuditEntry] = synchronized(audit.toSeq)

    def canRead(c: String, t: AccessToken): Boolean =
      check(c, t, Permission.Read)
    def canWrite(c: String, t: AccessToken): Boolean =
      check(c, t, Permission.Write)
    def canSearch(c: String, t: AccessToken): Boolean =
      check(c, t, Permission.Search)

    /** The reference decision walk (collection_rbac.rs:288-318). */
    def check(collection: String, token: AccessToken,
              perm: Permission): Boolean = synchronized {
      if (token.isExpired(now())) {
        logAudit(token, collection, perm, granted = false, None)
        return false
      }
      policies.get(collection) match {
        case Some(p) if p.enabled =>
          p.rules.find(r =>
            token.hasRole(r.role) && r.permissions.contains(perm)) match {
            case Some(rule) =>
              logAudit(token, collection, perm, granted = true,
                Some(rule.role)); true
            case None =>
              logAudit(token, collection, perm, granted = false, None); false
          }
        case Some(_) =>
          logAudit(token, collection, perm, granted = true,
            Some("policy-disabled")); true
        case None =>
          logAudit(token, collection, perm, granted = true,
            Some("no-policy")); true
      }
    }

    /** Row filters of every rule whose role the token holds
      * (collection_rbac.rs:321-334) — the reference's callback surface.
      */
    def rowFilters(collection: String, token: AccessToken): Seq[RowFilter] =
      synchronized {
        policies.get(collection) match {
          case Some(p) if p.enabled =>
            p.rules.filter(r => token.hasRole(r.role))
              .flatMap(_.rowFilters)
          case _ => Nil
        }
      }

    /** Matched rules for a (token, permission) — the rules that shape
      * what the subject may see.
      */
    private def matchedRules(collection: String, token: AccessToken,
                             perm: Permission): Option[Seq[PolicyRule]] =
      synchronized {
        if (token.isExpired(now())) return None
        policies.get(collection) match {
          case Some(p) if p.enabled =>
            val rs = p.rules.filter(r =>
              token.hasRole(r.role) && r.permissions.contains(perm))
            if (rs.isEmpty) None else Some(rs)
          case _ => Some(Nil) // disabled / absent policy: unrestricted
        }
      }

    /** ONE pushed-down predicate for the token's read/search access:
      * None = denied outright (expired token, or no rule grants the
      * permission); Some(cond) = the rows the subject may see — OR over
      * matched rules, each rule the AND of its filters (a filterless
      * rule grants the whole collection). `resolver` maps a metadata
      * field name to its Column.
      */
    def readPredicate(collection: String, token: AccessToken,
                      resolver: String => Column,
                      perm: Permission = Permission.Read): Option[Column] =
      matchedRules(collection, token, perm).map {
        case Nil => lit(true)
        case rules =>
          rules.map { r =>
            if (r.rowFilters.isEmpty) lit(true)
            else r.rowFilters.map(f => resolver(f.field) === lit(f.value))
              .reduce(_ && _)
          }.reduce(_ || _)
      }

    /** Union of matched rules' visible fields; None = unrestricted (no
      * matched rule restricts, or access is policy-free). A rule with an
      * EMPTY visible_fields list exposes everything
      * (collection_rbac.rs:97 "if non-empty, only these fields visible").
      */
    def visibleMetadataFields(collection: String, token: AccessToken,
                              perm: Permission = Permission.Read)
        : Option[Set[String]] =
      matchedRules(collection, token, perm).flatMap { rules =>
        if (rules.isEmpty || rules.exists(_.visibleFields.isEmpty)) None
        else Some(rules.flatMap(_.visibleFields).toSet)
      }

    /** RBAC-secured read: denied → empty (schema preserved); else the
      * compiled predicate filters scan-side and invisible metadata
      * columns drop from the projection before the scan.
      */
    def secureRead(df: DataFrame, collection: String, token: AccessToken,
                   metadataCols: Seq[String],
                   perm: Permission = Permission.Read): DataFrame = {
      readPredicate(collection, token, df(_), perm) match {
        case None => df.filter(lit(false))
        case Some(cond) =>
          // filter BEFORE pruning: a row filter may test a field the
          // projection then hides (filter on it, never show it) —
          // Catalyst still pushes the predicate and prunes the output
          // schema independently
          val filtered = df.filter(cond)
          visibleMetadataFields(collection, token, perm) match {
            case Some(vis) =>
              filtered.drop(metadataCols.filterNot(vis): _*)
            case None => filtered
          }
      }
    }

    private def logAudit(t: AccessToken, c: String, p: Permission,
                         granted: Boolean, rule: Option[String]): Unit = {
      audit.append(AuditEntry(t.subject, c, p.name, granted, now(), rule))
      if (audit.size > maxAudit) audit.removeHead()
    }
  }
}
