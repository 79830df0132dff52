package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Collection diff / merge (SURVEY.md §2.7; reference CLI `diff` and
  * `merge`: src/cli/handlers/search.rs:289-338, admin.rs:417-560).
  *
  * Both are id-keyed joins: diff is one full-outer join with an L2
  * comparison on shared ids; merge is the reference's per-id loop
  * re-expressed as set algebra (added = source ∖ target; shared rows pick
  * source or target by the 2-way/3-way rules). Everything shuffles on the
  * id key only — at scale these are bucketed-join jobs, never wider than
  * the collections themselves.
  */
object CollectionDiff {

  /** Per-id diff: status ∈ added | removed | modified | unchanged, with the
    * L2 distance on shared ids (reference threshold semantics: modified ⇔
    * dist > threshold; reference: search.rs:297-312). "removed" = only in
    * source, "added" = only in target, matching the CLI's -/+ output.
    */
  def diff(source: DataFrame, target: DataFrame, threshold: Double,
           idCol: String = "id", vecCol: String = "vector",
           roundTo: Option[Int] = None): DataFrame = {
    val a = source.select(col(idCol).as("id"), col(vecCol).as("__va"))
    val b = target.select(col(idCol).as("id"), col(vecCol).as("__vb"))
    val rawDist = Distances.euclidean(col("__va"), col("__vb"))
    val dist = roundTo.fold(rawDist)(n => round(rawDist, n))
    a.join(b, Seq("id"), "full_outer")
      .withColumn("l2_distance",
        when(col("__va").isNotNull && col("__vb").isNotNull, dist))
      .withColumn("status",
        when(col("__vb").isNull, "removed")
          .when(col("__va").isNull, "added")
          .when(col("l2_distance") > threshold, "modified")
          .otherwise("unchanged"))
      .select(col("id"), col("status"), col("l2_distance"))
  }

  /** Count summary (the CLI's report lines). */
  def diffSummary(source: DataFrame, target: DataFrame, threshold: Double,
                  idCol: String = "id", vecCol: String = "vector"): DataFrame =
    diff(source, target, threshold, idCol, vecCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))

  sealed trait MergeStrategy
  object MergeStrategy {
    case object SourceWins extends MergeStrategy
    case object TargetWins extends MergeStrategy // alias: skip
  }

  /** 2-way / 3-way merge of `source` into `target`
    * (reference: admin.rs:417-560). Shared-id resolution:
    *   - no base (2-way): strategy picks source or target wholesale;
    *   - with base (3-way): source-only change → source; target-only
    *     change → target; both changed → strategy; neither → target.
    * "Changed" compares the VECTOR against the base (admin.rs:462-468).
    * Returns the merged target collection.
    */
  def merge(source: DataFrame, target: DataFrame, base: Option[DataFrame],
            strategy: MergeStrategy,
            idCol: String = "id", vecCol: String = "vector"): DataFrame = {
    val srcCols = source.columns
    val added = source.join(target.select(idCol), Seq(idCol), "left_anti")

    val takeSource: Column = base match {
      case None => lit(strategy == MergeStrategy.SourceWins)
      case Some(_) =>
        val srcChanged = col("__bv").isNull || col("__sv") =!= col("__bv")
        val tgtChanged = col("__bv").isNull || col("__tv") =!= col("__bv")
        (srcChanged && !tgtChanged) ||
          (srcChanged && tgtChanged && lit(strategy == MergeStrategy.SourceWins))
    }

    val sharedIds = source.select(col(idCol)).join(target.select(col(idCol)), Seq(idCol))
    val annotated = {
      val withVecs = sharedIds
        .join(source.select(col(idCol), col(vecCol).as("__sv")), Seq(idCol))
        .join(target.select(col(idCol), col(vecCol).as("__tv")), Seq(idCol))
      base.fold(withVecs)(b =>
        withVecs.join(b.select(col(idCol), col(vecCol).as("__bv")), Seq(idCol), "left"))
    }
    val fromSourceIds = annotated.filter(takeSource).select(col(idCol))
    val fromSource = source.join(fromSourceIds, Seq(idCol), "left_semi")
    val keptTarget = target.join(fromSourceIds, Seq(idCol), "left_anti")

    keptTarget
      .unionByName(fromSource.select(srcCols.map(col): _*), allowMissingColumns = true)
      .unionByName(added, allowMissingColumns = true)
  }
}
