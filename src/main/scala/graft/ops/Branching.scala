package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Git-like collection branching with copy-on-write semantics (reference:
  * src/collection_branch.rs — BranchTree :146-500, diff :342-377, merge
  * :379-466, freeze :468-475).
  *
  * Spark shape: a branch is a LAZY delta layer — a DataFrame of local
  * changes (row payload + `__op` ∈ upsert|delete) over a parent chain.
  * DataFrames are immutable plans, so "copy-on-write" is literal: no data
  * is copied when branching, and [[resolve]] composes the ancestry with
  * anti-join + union per layer (child overrides parent — the reference's
  * read-through-parent-chain, expressed as one declarative plan that
  * Catalyst can optimize end-to-end). Layer frames are lineage-cut on
  * every mutation, so chains of mutations stay O(changes), not O(history).
  * At 100 TB the base stays untouched storage and each branch materializes
  * only its delta — the same economics as Delta Lake shallow clones.
  */
object Branching {

  final case class BranchInfo(name: String, parent: Option[String],
                              createdAt: Long, changeCount: Long,
                              frozen: Boolean)

  sealed trait MergeStrategy
  object MergeStrategy {
    case object SourceWins extends MergeStrategy
    case object TargetWins extends MergeStrategy
    case object Skip extends MergeStrategy
  }

  final case class MergeResult(merged: Long, conflicts: Long, skipped: Long,
                               conflictIds: Seq[String])

  final class BranchError(msg: String) extends IllegalArgumentException(msg)

  /** `initial` seeds the root "main" branch (its schema defines the row
    * payload; must contain `idCol`).
    */
  final class BranchTree(initial: DataFrame, idCol: String = "id") {

    private case class Layer(name: String, parent: Option[String],
                             var changes: DataFrame, // payload + __op
                             var frozen: Boolean, createdAt: Long)

    private val spark = initial.sparkSession
    private val template = initial.limit(0)
    private val layers = mutable.LinkedHashMap[String, Layer](
      "main" -> Layer("main", None,
        initial.withColumn("__op", lit("upsert")).localCheckpoint(true),
        frozen = false, createdAt = now()))

    private def now() = System.currentTimeMillis() / 1000

    private def layer(name: String): Layer =
      layers.getOrElse(name, throw new BranchError(s"Branch '$name' not found"))

    // ------------------------------------------------------------ lifecycle

    /** Create `name` from `parent` — zero data copied (collection_branch
      * .rs:179-207). */
    def createBranch(name: String, parent: String = "main"): this.type = {
      if (layers.contains(name))
        throw new BranchError(s"Branch '$name' already exists")
      layer(parent) // existence check
      layers(name) = Layer(name, Some(parent),
        template.withColumn("__op", lit("upsert")).limit(0),
        frozen = false, createdAt = now())
      this
    }

    /** Delete a branch; main and branches with children are protected
      * (collection_branch.rs:209-231). */
    def deleteBranch(name: String): this.type = {
      if (name == "main") throw new BranchError("Cannot delete main branch")
      layer(name)
      if (layers.values.exists(_.parent.contains(name)))
        throw new BranchError(s"Branch '$name' has child branches")
      layers.remove(name)
      this
    }

    def listBranches: Seq[BranchInfo] = layers.values.map(l =>
      BranchInfo(l.name, l.parent, l.createdAt, l.changes.count(),
        l.frozen)).toSeq

    def branchInfo(name: String): Option[BranchInfo] =
      layers.get(name).map(l => BranchInfo(l.name, l.parent, l.createdAt,
        l.changes.count(), l.frozen))

    /** Make a branch read-only (collection_branch.rs:468-475). */
    def freeze(name: String): this.type = { layer(name).frozen = true; this }

    // ------------------------------------------------------------ mutations

    private def mutate(name: String, change: DataFrame): Unit = {
      val l = layer(name)
      if (l.frozen) throw new BranchError(s"Branch '$name' is frozen")
      // within a layer the LAST change per id wins: compact on write —
      // including WITHIN the incoming batch (the reference's per-doc
      // HashMap loop gives a same-id repeat in one batch last-wins
      // semantics; without this a duplicated id leaves two layer rows
      // and resolve() emits the id twice). One id-keyed window over the
      // union does both the batch-internal and batch-vs-layer
      // compaction — same single shuffle the old anti-join form paid.
      // Old layer rows ride at __seq = -1 (the layer invariant is one
      // row per id, so -1 never ties); batch rows get increasing
      // nonnegative seqs, so the newest occurrence wins everywhere.
      //
      // ORDERING CONTRACT: "last occurrence" is the batch's PHYSICAL
      // (partition-index, row-offset) order — that is what
      // monotonically_increasing_id encodes. For a locally built or
      // chunk-parallelized frame physical order IS logical row order
      // (matching the reference's document-order HashMap loop, pinned
      // by BranchingModelSpec); for a batch that is itself the output
      // of a shuffle there is no logical row order to honor, and the
      // winner is whatever the (deterministic) physical layout puts
      // last — stable across runs for deterministic inputs (pinned by
      // the multi-partition model-spec case), but callers that care
      // which duplicate wins should sort/coalesce the batch, or
      // pre-compact it, before upsert.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol)).orderBy(col("__seq").desc)
      l.changes = l.changes.withColumn("__seq", lit(-1L))
        .unionByName(change.withColumn("__seq",
          monotonically_increasing_id()))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__seq", "__rn")
        .localCheckpoint(true) // bound lineage across mutations
    }

    /** Upsert rows (payload schema of `initial`) into a branch's layer.
      * Duplicate ids within one batch compact last-occurrence-wins in the
      * batch's physical row order — see the contract on `mutate`. */
    def upsert(name: String, rows: DataFrame): this.type = {
      mutate(name, rows.withColumn("__op", lit("upsert"))); this
    }

    /** Mark ids deleted in a branch's layer (visible rows of the parent
      * chain are masked, parent data untouched). */
    def delete(name: String, ids: Seq[String]): this.type = {
      import spark.implicits._
      // tombstone rows: the id plus null payload columns
      val keyed = ids.toDF(idCol)
        .withColumn(idCol, col(idCol).cast(template.schema(idCol).dataType))
      val nulls = template.columns.filterNot(_ == idCol).foldLeft(keyed) {
        case (df, c) => df.withColumn(c, lit(null).cast(template.schema(c).dataType))
      }
      mutate(name, nulls.withColumn("__op", lit("delete")))
      this
    }

    // ------------------------------------------------------------- reads

    /** The branch's visible state: fold the ancestry root→branch, each
      * layer overriding its parent (upsert replaces, delete masks). One
      * declarative plan — no per-read data movement beyond the deltas.
      */
    def resolve(name: String): DataFrame = {
      val chain = ancestry(name) // root..name
      chain.foldLeft(template) { (state, l) =>
        val ups = l.changes.filter(col("__op") === "upsert").drop("__op")
        state.join(l.changes.select(col(idCol)), Seq(idCol), "left_anti")
          .unionByName(ups)
      }
    }

    private def ancestry(name: String): Seq[Layer] = {
      var chain = List(layer(name))
      while (chain.head.parent.isDefined)
        chain = layer(chain.head.parent.get) :: chain
      chain
    }

    def contains(name: String, id: String): Boolean =
      !resolve(name).filter(col(idCol) === id).isEmpty

    def get(name: String, id: String): Option[org.apache.spark.sql.Row] =
      resolve(name).filter(col(idCol) === id).collect().headOption

    def listIds(name: String): Seq[String] =
      resolve(name).select(col(idCol).cast("string")).orderBy(col(idCol))
        .collect().map(_.getString(0)).toSeq

    // ------------------------------------------------------------ diff/merge

    /** Changes in `source`'s local layer relative to `target`'s visible
      * state, as (id, status ∈ added|deleted|modified) — the reference's
      * DiffEntry semantics (collection_branch.rs:342-377: upsert+exists →
      * modified, upsert+absent → added, delete+exists → deleted,
      * delete+absent → omitted).
      */
    def diff(source: String, target: String): DataFrame = {
      val src = layer(source).changes.select(col(idCol), col("__op"))
      val tgtIds = resolve(target).select(col(idCol))
        .withColumn("__in_t", lit(true))
      src.join(tgtIds, Seq(idCol), "left")
        .withColumn("status",
          when(col("__op") === "upsert",
            when(col("__in_t").isNotNull, "modified").otherwise("added"))
            .otherwise(when(col("__in_t").isNotNull, "deleted")))
        .filter(col("status").isNotNull)
        .select(col(idCol), col("status"))
        .orderBy(col(idCol))
    }

    /** Merge `source`'s local changes into `target`'s layer. A conflict is
      * an id locally changed in BOTH layers (collection_branch.rs:379-466);
      * SourceWins applies it anyway, TargetWins/Skip leave the target's
      * change in place.
      */
    def merge(source: String, target: String,
              strategy: MergeStrategy = MergeStrategy.SourceWins): MergeResult = {
      if (source == target)
        throw new BranchError("Cannot merge a branch into itself")
      val src = layer(source); val tgt = layer(target)
      if (tgt.frozen) throw new BranchError(s"Branch '$target' is frozen")
      val conflictIds = src.changes.select(col(idCol))
        .join(tgt.changes.select(col(idCol)), Seq(idCol), "left_semi")
        .orderBy(col(idCol))
        .collect().map(_.get(0).toString).toSeq
      val toApply = strategy match {
        case MergeStrategy.SourceWins => src.changes
        case _ => src.changes.join(
          tgt.changes.select(col(idCol)), Seq(idCol), "left_anti")
      }
      val merged = toApply.count()
      mutate(target, toApply)
      MergeResult(merged = merged, conflicts = conflictIds.size,
        skipped = strategy match {
          case MergeStrategy.SourceWins => 0L
          case _ => conflictIds.size.toLong
        },
        conflictIds = conflictIds)
    }
  }
}
