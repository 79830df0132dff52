package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-level access control (reference: src/enterprise/vector_acl.rs).
  *
  * The reference evaluates its priority-ordered first-match policy walk
  * per vector at query time (vector_acl.rs:259-341). Re-expressed
  * Spark-first, the SAME walk compiles once per request into a Catalyst
  * `CASE WHEN` chain over the collection's columns
  * ([[AclEngine.searchPredicate]]): principal matching is driver-side
  * (the request context is a constant), so each policy either drops out
  * entirely or contributes one row-level condition, and the resulting
  * predicate is codegen'd, pushed into the parquet scan, and prunes
  * row-groups — row-level security costs the same as any metadata
  * filter at 100 TB, with no per-row callback.
  *
  * Field-level security (`ResourceMatcher.FieldName` + Deny,
  * vector_acl.rs:291-297) maps to column pruning: the denied fields are
  * dropped from the projection, so the scan never reads them.
  *
  * The driver-side [[AclEngine.evaluate]] single-vector path (the get /
  * write / delete gate) mirrors vector_acl.rs:259-341, including the
  * bounded audit log, with ONE deliberate divergence: the reference's
  * evaluate loop stops collecting Deny-FieldName redactions at the first
  * row-deciding policy match, so a field deny whose priority sorts BELOW
  * the winning row policy is silently not redacted there. This engine
  * applies every matching field deny regardless of where the row decision
  * lands — strictly more restrictive (a field deny always redacts), and
  * the only semantics that vectorize: in [[AclEngine.searchPredicate]]
  * the winning row policy varies per row, so a winner-relative redaction
  * set would need per-row projection. Divergence is spec-pinned in
  * AclSpec ("field denies below the winning row policy still redact").
  */
object Acl {

  sealed trait AclAction
  object AclAction {
    case object Read extends AclAction
    case object Write extends AclAction
    case object Delete extends AclAction
    case object Search extends AclAction
    case object ReadMetadata extends AclAction
  }

  sealed trait Effect
  object Effect {
    case object Allow extends Effect
    case object Deny extends Effect
  }

  /** Who a policy applies to (vector_acl.rs:76-85). */
  sealed trait PrincipalMatcher
  object PrincipalMatcher {
    case object Any extends PrincipalMatcher
    final case class UserId(id: String) extends PrincipalMatcher
    final case class Role(role: String) extends PrincipalMatcher
    final case class Attribute(key: String, value: String)
        extends PrincipalMatcher
  }

  /** What rows/fields a policy covers (vector_acl.rs:89-99). */
  sealed trait ResourceMatcher
  object ResourceMatcher {
    case object Any extends ResourceMatcher
    /** Exact id, or prefix when the pattern ends with `*`. */
    final case class VectorId(pattern: String) extends ResourceMatcher
    /** Rows whose metadata field equals the value. */
    final case class MetadataField(field: String, value: String)
        extends ResourceMatcher
    /** Field-level ACL: names a metadata field, always matches at row
      * level; with Deny it redacts the field instead of the row.
      */
    final case class FieldName(field: String) extends ResourceMatcher
  }

  final case class AclPolicy(id: String,
                             principal: PrincipalMatcher,
                             resource: ResourceMatcher,
                             effect: Effect,
                             actions: Set[AclAction],
                             priority: Int = 0,
                             description: String = "")

  final case class RequestContext(userId: String,
                                  roles: Seq[String] = Seq.empty,
                                  attributes: Map[String, String] = Map.empty)

  final case class AccessDecision(allowed: Boolean,
                                  policyId: Option[String],
                                  reason: String,
                                  redactedFields: Seq[String])

  final case class AclAuditEntry(timestamp: Long,
                                 userId: String,
                                 action: AclAction,
                                 vectorId: String,
                                 allowed: Boolean,
                                 policyId: Option[String])

  private def matchesPrincipal(m: PrincipalMatcher,
                               ctx: RequestContext): Boolean = m match {
    case PrincipalMatcher.Any           => true
    case PrincipalMatcher.UserId(id)    => ctx.userId == id
    case PrincipalMatcher.Role(r)       => ctx.roles.contains(r)
    case PrincipalMatcher.Attribute(k, v) => ctx.attributes.get(k).contains(v)
  }

  /** Deny-by-default engine; `AclEngine.allowByDefault` for opt-in deny. */
  final class AclEngine private (defaultEffect: Effect) {
    private var ordered: Vector[AclPolicy] = Vector.empty
    private val audit = mutable.Queue.empty[AclAuditEntry]
    private val maxAuditEntries = 10000
    /** Monotonic clock source; injectable for deterministic specs. */
    var now: () => Long = () => System.currentTimeMillis() / 1000L

    def addPolicy(p: AclPolicy): this.type = {
      require(p.id.nonEmpty, "Policy ID cannot be empty")
      require(!ordered.exists(_.id == p.id), s"Duplicate policy ID: '${p.id}'")
      // Stable sort: ties keep insertion order (vector_acl.rs:246).
      ordered = (ordered :+ p).sortBy(-_.priority)
      this
    }

    def removePolicy(id: String): Boolean = {
      val before = ordered.size
      ordered = ordered.filterNot(_.id == id)
      ordered.size < before
    }

    def listPolicies: Seq[AclPolicy] = ordered

    /** Policies applicable to (ctx, action), priority order, with the
      * field-level-deny rows split off as redactions — the shared walk
      * behind both `evaluate` and `searchPredicate`.
      */
    private def applicable(ctx: RequestContext, action: AclAction)
        : (Seq[AclPolicy], Seq[String]) = {
      val hits = ordered.filter(p =>
        p.actions.contains(action) && matchesPrincipal(p.principal, ctx))
      val (fieldDenies, rowPolicies) = hits.partition(p =>
        p.effect == Effect.Deny && p.resource.isInstanceOf[ResourceMatcher.FieldName])
      (rowPolicies,
       fieldDenies.map(_.resource.asInstanceOf[ResourceMatcher.FieldName].field))
    }

    /** Driver-side single-vector decision (vector_acl.rs:259-341): first
      * matching policy in priority order wins; Deny FieldName policies
      * accumulate as redactions without deciding the row.
      */
    def evaluate(ctx: RequestContext, action: AclAction, vectorId: String,
                 metadata: Map[String, String]): AccessDecision = {
      val (rowPolicies, redactions) = applicable(ctx, action)
      val hit = rowPolicies.find { p =>
        p.resource match {
          case ResourceMatcher.Any => true
          case ResourceMatcher.VectorId(pat) =>
            if (pat.endsWith("*")) vectorId.startsWith(pat.dropRight(1))
            else vectorId == pat
          case ResourceMatcher.MetadataField(f, v) => metadata.get(f).contains(v)
          case ResourceMatcher.FieldName(_) => true
        }
      }
      val decision = hit match {
        case Some(p) if p.effect == Effect.Allow =>
          AccessDecision(allowed = true, Some(p.id),
            s"Allowed by policy '${p.id}'", redactions)
        case Some(p) =>
          AccessDecision(allowed = false, Some(p.id),
            s"Denied by policy '${p.id}'", redactions)
        case None =>
          AccessDecision(defaultEffect == Effect.Allow, None,
            if (defaultEffect == Effect.Allow) "Default allow"
            else "Default deny — no matching policy", redactions)
      }
      audit.enqueue(AclAuditEntry(now(), ctx.userId, action, vectorId,
        decision.allowed, decision.policyId))
      while (audit.size > maxAuditEntries) audit.dequeue()
      decision
    }

    /** The data-plane form of `evaluate`: the identical priority-ordered
      * first-match walk compiled into one Catalyst boolean expression.
      * `idCol` is the collection's (string) id column; metadata fields
      * resolve through `fieldCol` (default: a plain column of that name).
      * Fully codegen'd — a chain of `when` over string equality/prefix —
      * so Catalyst pushes it into the scan wherever the comparisons are
      * scan-level columns.
      */
    def searchPredicate(ctx: RequestContext,
                        action: AclAction = AclAction.Search,
                        idCol: Column = col("id"),
                        fieldCol: String => Column = col(_)): Column = {
      val (rowPolicies, _) = applicable(ctx, action)
      val chain = rowPolicies.map { p =>
        val cond: Column = p.resource match {
          case ResourceMatcher.Any => lit(true)
          case ResourceMatcher.VectorId(pat) =>
            if (pat.endsWith("*")) idCol.startsWith(pat.dropRight(1))
            else idCol === pat
          case ResourceMatcher.MetadataField(f, v) => fieldCol(f) === v
          case ResourceMatcher.FieldName(_) => lit(true)
        }
        (cond, p.effect == Effect.Allow)
      }
      chain.foldRight(lit(defaultEffect == Effect.Allow)) {
        case ((cond, allows), rest) => when(cond, lit(allows)).otherwise(rest)
      }
    }

    /** Field names a Deny FieldName policy redacts for (ctx, action) —
      * apply as column pruning (`df.drop`): the scan never reads them.
      */
    def redactedFields(ctx: RequestContext,
                       action: AclAction = AclAction.Search): Seq[String] =
      applicable(ctx, action)._2

    /** Reference parity (vector_acl.rs:341-357): the (field, value) pairs
      * of Allow MetadataField policies matching the principal, to AND
      * with a user query for row-level security.
      */
    def rowLevelFilters(ctx: RequestContext): Seq[(String, String)] =
      ordered.collect {
        case p @ AclPolicy(_, _, ResourceMatcher.MetadataField(f, v),
                           Effect.Allow, _, _, _)
            if matchesPrincipal(p.principal, ctx) => (f, v)
      }

    /** ACL-enforced search: predicate (pushed down) + field redaction
      * (column pruning) around the exact top-k engine.
      */
    def securedSearch(df: DataFrame, ctx: RequestContext, vecCol: Column,
                      query: Column, k: Int, metric: String = "cosine",
                      idCol: String = "id"): DataFrame = {
      val filtered = df.filter(searchPredicate(ctx, AclAction.Search,
        col(idCol).cast("string"), col(_)))
      val pruned = redactedFields(ctx, AclAction.Search)
        .foldLeft(filtered)(_ drop _)
      Search.topK(pruned, vecCol, query, k, metric, idCol)
    }

    def auditLog: Seq[AclAuditEntry] = audit.toSeq
    def clearAuditLog(): Unit = audit.clear()
  }

  object AclEngine {
    /** Deny-by-default (vector_acl.rs:210). */
    def apply(): AclEngine = new AclEngine(Effect.Deny)
    /** Allow-by-default (vector_acl.rs:220) — opt-in deny. */
    def allowByDefault(): AclEngine = new AclEngine(Effect.Allow)
  }
}
