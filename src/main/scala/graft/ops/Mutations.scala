package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Mutation operators (SURVEY.md §2.1; reference:
  * src/collection/mutations.rs, dedup.rs, ttl.rs, accessors.rs).
  *
  * A collection is any DataFrame with an id column; the full convention is
  * `(id, vector, metadata, inserted_at, ttl_expires_at, deleted)`. Every
  * operator is a pure DataFrame → DataFrame transformation — at scale these
  * become MERGE/rewrite jobs over partitioned parquet (each op shuffles at
  * most on the id key; compact/expire are scan-and-rewrite with no shuffle).
  */
object Mutations {

  /** MERGE-style upsert: rows in `updates` replace same-id rows, others
    * append (reference: mutations.rs:203).
    */
  def upsert(coll: DataFrame, updates: DataFrame, idCol: String = "id"): DataFrame =
    coll.join(updates.select(idCol), Seq(idCol), "left_anti")
      .unionByName(updates, allowMissingColumns = true)

  /** Metadata-only update (reference: mutations.rs:154): join the changes
    * and swap the metadata column, leaving everything else untouched.
    */
  def updateMetadata(coll: DataFrame, changes: DataFrame, idCol: String = "id",
                     metaCol: String = "metadata"): DataFrame =
    coll.join(changes.select(col(idCol), col(metaCol).as("__new_meta")),
        Seq(idCol), "left")
      .withColumn(metaCol, coalesce(col("__new_meta"), col(metaCol)))
      .drop("__new_meta")

  /** The reference's JSON merge-patch (metadata.rs:538-561): SHALLOW —
    * top-level keys of the patch overwrite, null removes the key,
    * non-object patch or target replaces wholesale. (RFC 7386 recurses;
    * the reference deliberately does not.)
    */
  def mergePatchJson(target: String, patch: String): String = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.ObjectNode
    val mapper = new ObjectMapper()
    val p = mapper.readTree(if (patch == null) "null" else patch)
    val t = mapper.readTree(if (target == null) "{}" else target)
    (t, p) match {
      case (to: ObjectNode, po: ObjectNode) =>
        val merged = to.deepCopy()
        val it = po.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.isNull) merged.remove(e.getKey)
          else merged.set(e.getKey, e.getValue)
        }
        mapper.writeValueAsString(merged)
      case _ => mapper.writeValueAsString(p)
    }
  }
  val mergePatchUdf = udf((t: String, p: String) => mergePatchJson(t, p))

  /** Sequential fold of several patches onto one target, in list order —
    * matches the reference's per-insert sequential merge
    * (dedup.rs apply_dedup_policy). Note this is NOT the same as merging
    * the patches first: a null (delete) in patch 1 can be re-added by
    * patch 2, so the fold must run against the target.
    */
  val mergePatchManyUdf = udf((t: String, ps: Seq[String]) =>
    ps.foldLeft(t)(mergePatchJson))

  def mergePatch(coll: DataFrame, patches: DataFrame, idCol: String = "id",
                 metaCol: String = "metadata"): DataFrame =
    coll.join(patches.select(col(idCol), col(metaCol).as("__patch")),
        Seq(idCol), "left")
      .withColumn(metaCol,
        when(col("__patch").isNull, col(metaCol))
          .otherwise(mergePatchUdf(col(metaCol), col("__patch"))))
      .drop("__patch")

  /** Tombstone delete (reference: mutations.rs:27): flip `deleted`. */
  def tombstone(coll: DataFrame, pred: Column,
                deletedCol: String = "deleted"): DataFrame =
    coll.withColumn(deletedCol, col(deletedCol) || coalesce(pred, lit(false)))

  /** Remove all rows, keep schema (reference: mutations.rs:247). */
  def clear(coll: DataFrame): DataFrame = coll.limit(0)

  /** TTL sweep (reference: ttl.rs:52): hard-drop rows with
    * `ttl_expires_at <= now` (the reference expires at `now >= expiration`).
    */
  def expireVectors(coll: DataFrame, nowEpochS: Long,
                    ttlCol: String = "ttl_expires_at"): DataFrame =
    coll.filter(col(ttlCol).isNull || col(ttlCol) > nowEpochS)

  /** TTL stats (reference: ttl.rs:130). */
  def ttlStats(coll: DataFrame, nowEpochS: Long,
               ttlCol: String = "ttl_expires_at"): DataFrame =
    coll.agg(
      count(lit(1)).as("total"),
      count(col(ttlCol)).as("with_ttl"),
      sum(when(col(ttlCol) <= nowEpochS, 1L).otherwise(0L)).as("expired"))

  /** Physical compaction (reference: accessors.rs:166): TTL sweep + drop
    * tombstones.
    */
  def compact(coll: DataFrame, nowEpochS: Long,
              deletedCol: String = "deleted",
              ttlCol: String = "ttl_expires_at"): DataFrame =
    expireVectors(coll, nowEpochS, ttlCol)
      .filter(!coalesce(col(deletedCol), lit(false)))

  /** `needs_compaction(threshold)` (reference: accessors.rs:241): tombstone
    * fraction exceeds the threshold.
    */
  def needsCompaction(coll: DataFrame, threshold: Double,
                      deletedCol: String = "deleted"): Boolean = {
    val row = coll.agg(count(lit(1)).as("n"),
      sum(when(coalesce(col(deletedCol), lit(false)), 1L).otherwise(0L)).as("d"))
      .collect()(0)
    val n = row.getLong(0)
    n > 0 && row.getLong(1).toDouble / n > threshold
  }

  // ------------------------------------------------------- dedup-on-insert

  sealed trait DedupPolicy
  object DedupPolicy {
    case object Reject extends DedupPolicy
    case object MergeMetadata extends DedupPolicy
    case object Version extends DedupPolicy
  }

  final case class DedupResult(collection: DataFrame, outcomes: DataFrame)

  /** Batch dedup-on-insert (reference: dedup.rs:82-160): each incoming row
    * is 1-NN-checked against the existing collection; a nearest distance
    * strictly below `threshold` triggers the policy:
    *   Reject        — row dropped;
    *   MergeMetadata — existing row's metadata merge-patched with the
    *                   incoming metadata, row dropped;
    *   Version       — row inserted under `id-v<n>`.
    * Outcomes has one row per incoming id: (id, outcome, existing_id,
    * distance); ties break on existing id.
    *
    * The 1-NN has two physical shapes, picked by collection size:
    *   - at or below `maxExactRows` existing rows: the definitional exact
    *     form — |incoming|×|coll| distance pairs via crossJoin + min-struct
    *     aggregate (fine for a small collection or a small batch against a
    *     small store; the semantics oracle);
    *   - above `maxExactRows`: IVF cell blocking (the
    *     Ivf.nearDupBlocked shape) — centroids fit on a bounded sample,
    *     existing rows assigned to their nearest cell (one narrow
    *     full-data map), each incoming row exploded to its `nprobe`
    *     nearest cells, and distances computed only inside the cell
    *     equi-join. Work drops from |incoming|×|coll| to
    *     |incoming|×nprobe×(|coll|/numCells) expected, and the join is a
    *     shuffle-on-cell equi-join — the shape that survives a streaming
    *     ingest batch against a 100 TB store. Near-dup detection is then
    *     multi-probe-approximate: a duplicate hiding beyond the incoming
    *     vector's `nprobe` nearest cells is missed, which at dup-grade
    *     thresholds requires the pair to straddle `nprobe` cell boundaries
    *     at once.
    */
  def dedupInsert(coll: DataFrame, incoming: DataFrame, threshold: Double,
                  policy: DedupPolicy, metric: String = "cosine",
                  idCol: String = "id", vecCol: String = "vector",
                  metaCol: String = "metadata",
                  roundTo: Int = 6, maxExactRows: Int = 100000,
                  numCells: Int = 64, nprobe: Int = 4): DedupResult = {
    val exact = coll.limit(maxExactRows + 1).count() <= maxExactRows
    val pairs =
      if (exact) {
        val existing = coll.select(col(idCol).as("__eid"), col(vecCol).as("__evec"))
        incoming.select(col(idCol), col(vecCol)).crossJoin(existing)
      } else {
        val ix = graft.ann.Ivf.build(
          coll.select(col(idCol), col(vecCol)), col(vecCol), numCells, metric)
        val existing = ix.assigned.select(col("cell"),
          col(idCol).as("__eid"), col(vecCol).as("__evec"))
        incoming.select(col(idCol), col(vecCol))
          .withColumn("cell", explode(
            graft.ann.Ivf.probeCellsOf(col(vecCol), ix.centroids, metric, nprobe)))
          .join(existing, Seq("cell"))
      }
    val nn = pairs
      .withColumn("__d",
        round(Distances.distance(metric, col(vecCol), col("__evec")), roundTo))
      .groupBy(col(idCol))
      .agg(min(struct(col("__d"), col("__eid"))).as("__nn"))
      .select(col(idCol), col("__nn.__d").as("distance"),
        col("__nn.__eid").as("existing_id"))
    // nn has at most |incoming| rows — always broadcastable
    val checked = incoming.join(broadcast(nn), Seq(idCol), "left")
      .withColumn("__dup", col("distance").isNotNull && col("distance") < threshold)

    val outcomes = checked.select(col(idCol),
      when(!col("__dup"), "inserted")
        .otherwise(policy match {
          case DedupPolicy.Reject        => lit("rejected")
          case DedupPolicy.MergeMetadata => lit("metadata_merged")
          case DedupPolicy.Version       => lit("versioned")
        }).as("outcome"),
      when(col("__dup"), col("existing_id")).as("existing_id"),
      when(col("__dup"), col("distance")).as("distance"))

    val fresh = checked.filter(!col("__dup"))
      .drop("distance", "existing_id", "__dup")
    val dupes = checked.filter(col("__dup"))

    val newColl = policy match {
      case DedupPolicy.Reject =>
        coll.unionByName(fresh, allowMissingColumns = true)
      case DedupPolicy.MergeMetadata =>
        // Two+ incoming near-dups of the SAME existing id must collapse to
        // ONE patch row (a left join against duplicate keys would fan the
        // target row out). Fold the patches sequentially in incoming-id
        // order — the deterministic analogue of the reference's per-insert
        // sequential merge.
        val patchLists = dupes
          .groupBy(col("existing_id"))
          .agg(transform(
            sort_array(collect_list(struct(
              col(idCol).cast("string").as("o"), col(metaCol).as("m")))),
            x => x.getField("m")).as("__patches"))
          .withColumnRenamed("existing_id", idCol)
        val patched = coll
          .join(broadcast(patchLists), Seq(idCol), "left")
          .withColumn(metaCol,
            when(col("__patches").isNull, col(metaCol))
              .otherwise(mergePatchManyUdf(col(metaCol), col("__patches"))))
          .drop("__patches")
        patched.unionByName(fresh, allowMissingColumns = true)
      case DedupPolicy.Version =>
        // Version suffix must be unique ACROSS calls: count the versioned
        // rows already in the collection for each base id ('x-v<n>'), then
        // number batch-locally on top of that (reference uniquifies with
        // collection length, dedup.rs:apply_dedup_policy).
        val dupIds = dupes.select(col(idCol).cast("string").as("__base")).distinct()
        val vcnt = coll
          .select(regexp_extract(col(idCol).cast("string"),
            "^(.*)-v\\d+$", 1).as("__base"))
          .filter(col("__base") =!= "")
          .join(broadcast(dupIds), Seq("__base"))
          .groupBy("__base").agg(count(lit(1)).as("__vcnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("existing_id"))
        val versioned = dupes
          .join(broadcast(vcnt), col(idCol).cast("string") === col("__base"), "left")
          .withColumn("__rank", row_number().over(w))
          .withColumn(idCol, concat(col(idCol).cast("string"), lit("-v"),
            (coalesce(col("__vcnt"), lit(0L)) + col("__rank")).cast("string")))
          .drop("__base", "__vcnt", "__rank", "distance", "existing_id", "__dup")
        coll.unionByName(fresh, allowMissingColumns = true)
          .unionByName(versioned, allowMissingColumns = true)
    }
    DedupResult(newColl, outcomes)
  }
}
