package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CRDT replication for vector collections (reference:
  * src/experimental/crdt.rs) — hybrid-logical-clock op-logs with
  * last-writer-wins convergence, delta sync, and Merkle-tree anti-entropy.
  *
  * Spark re-expression: the reference replays per-replica operation deltas
  * through `apply_operation` (crdt.rs:370-437) into a HashMap. CRDT
  * convergence means the final state is a pure function of the SET of
  * operations — so the distributed form skips replay entirely and computes
  * the converged state relationally from the unioned op-log:
  *
  *   - HLC order = (physical, logical, replica) lexicographic (the derive
  *     on crdt.rs:64-72).
  *   - An entry is ALIVE iff it has an Add and its latest Add out-ranks
  *     the latest Delete (Add fully replaces the entry, clearing the
  *     tombstone — crdt.rs:379-393; Delete only applies when newer —
  *     :421-431).
  *   - The payload is the max-HLC op among the winning Add and the Updates
  *     that out-rank it (Updates on deleted/absent entries are skipped —
  *     :394-400 — and an Add replaces the whole entry, so pre-Add updates
  *     never survive into the converged state).
  *   - Metadata = the winning Add's map overlaid with per-key LWW of
  *     UpdateMetadata ops out-ranking the Add; a null value removes the
  *     key (:401-420).
  *
  * Op-log schema: (id, op ∈ add|update|update_metadata|delete,
  * physical, logical, replica, payload, meta, meta_key, meta_value) —
  * `payload` is the vector (any column type: the algebra never inspects
  * it), `meta` the Add-time map, meta_key/value the UpdateMetadata fields.
  *
  * Scale: converge is two grouped aggregations + one per-id window over
  * the op-log — shuffles keyed by id only. Merkle bucketing sorts (id,
  * hash) pairs once (narrow two-column sort) to reproduce the reference's
  * contiguous-range buckets (crdt.rs:858-897); bucket hashes then fold
  * bounded sorted buckets.
  */
object Crdt {

  private def hlc(prefix: String = ""): Column =
    struct(col(prefix + "physical"), col(prefix + "logical"),
      col(prefix + "replica"))

  /** Converged LWW state of a unioned op-log: one row per alive id with
    * (id, payload, physical, logical, replica) of the winning op, plus
    * `metadata` when the log carries meta columns (metaCols = true).
    */
  def converge(opLog: DataFrame, metaCols: Boolean = false): DataFrame = {
    val ts = opLog.withColumn("__hlc", hlc())
    val anchors = ts.groupBy(col("id")).agg(
      max(when(col("op") === "add", col("__hlc"))).as("__last_add"),
      max(when(col("op") === "delete", col("__hlc"))).as("__last_delete"))
    val alive = anchors.filter(col("__last_add").isNotNull &&
      (col("__last_delete").isNull || col("__last_add") > col("__last_delete")))
    // ops that APPLIED to the surviving entry: the winning Add plus the
    // Updates/UpdateMetadatas that out-rank it. Payload comes from
    // add/update only, but updated_at is the max clock across ALL applied
    // ops — UpdateMetadata bumps it too (crdt.rs:415).
    val eff = ts.join(alive.select(col("id"), col("__last_add")), "id")
      .filter((col("op") === "add" && col("__hlc") === col("__last_add")) ||
        (col("op").isin("update", "update_metadata") &&
          col("__hlc") > col("__last_add")))
    val w = Window.partitionBy(col("id"))
      .orderBy((col("op") =!= "update_metadata").desc, col("__hlc").desc)
    val state = eff
      .withColumn("__max_hlc",
        max(col("__hlc")).over(Window.partitionBy(col("id"))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("payload"),
        col("__max_hlc.physical").as("physical"),
        col("__max_hlc.logical").as("logical"),
        col("__max_hlc.replica").as("replica"))
    if (!metaCols) state
    else {
      // Add-time map entries stamped with the Add's HLC, overlaid with
      // out-ranking UpdateMetadata ops; per-key LWW; null value removes.
      val addMeta = ts.join(alive.select(col("id"), col("__last_add")), "id")
        .filter(col("op") === "add" && col("__hlc") === col("__last_add"))
        .select(col("id"), col("__hlc"), explode_outer(col("meta")).as(Seq("k", "v")))
        .filter(col("k").isNotNull)
      val updMeta = ts.join(alive.select(col("id"), col("__last_add")), "id")
        .filter(col("op") === "update_metadata" && col("__hlc") > col("__last_add"))
        .select(col("id"), col("__hlc"), col("meta_key").as("k"),
          col("meta_value").as("v"))
      val kw = Window.partitionBy(col("id"), col("k")).orderBy(col("__hlc").desc)
      val merged = addMeta.unionByName(updMeta)
        .withColumn("__rn", row_number().over(kw))
        .filter(col("__rn") === 1 && col("v").isNotNull)
        .groupBy(col("id"))
        .agg(map_from_entries(collect_list(struct(col("k"), col("v"))))
          .as("metadata"))
      state.join(merged, Seq("id"), "left")
    }
  }

  /** Delta since a clock: ops with HLC ≥ since (crdt.rs:448-469; None →
    * everything). `since` = (physical, logical, replica).
    */
  def deltaSince(opLog: DataFrame,
                 since: Option[(Long, Long, Long)]): DataFrame =
    since.fold(opLog) { case (p, l, r) =>
      opLog.filter(hlc() >= struct(lit(p), lit(l), lit(r)))
    }

  /** Merge conflict census against a converged local state
    * (crdt.rs:507-522): remote Update/Delete ops whose HLC shares the
    * local winner's physical timestamp under a different replica.
    */
  def conflicts(local: DataFrame, delta: DataFrame): DataFrame =
    delta.filter(col("op").isin("update", "delete"))
      .join(local.select(col("id"), col("physical").as("__lp"),
        col("replica").as("__lr")), "id")
      .filter(col("physical") === col("__lp") && col("replica") =!= col("__lr"))
      .select(col("id"), col("op"), col("physical"), col("logical"),
        col("replica"))

  // ------------------------------------------------------------- merkle

  /** The reference's string hash: fold bytes ×31 + byte, wrapping u64
    * (crdt.rs:981-984), as a codegen-friendly aggregate over a bounded
    * byte array (ids are keys, not documents).
    */
  private val idHash = udf { (id: String) =>
    var h = 0L
    id.getBytes("UTF-8").foreach(b => h = h * 31L + (b & 0xff).toLong)
    h
  }

  /** Bucket assignment reproducing crdt.rs:867-876: ids sorted, n/buckets
    * per bucket (floor), last bucket takes the remainder. Output:
    * (id, value_hash, bucket).
    */
  def bucketed(entries: DataFrame, idCol: Column, hashCol: Column,
               bucketCount: Int): DataFrame = {
    val buckets = math.max(Integer.highestOneBit(math.max(bucketCount - 1, 1)) * 2, 2)
    // the reference's global entry sort, as a distributed exact rank
    // (range partition + prefix shift — never a single-partition window);
    // the rank's nCol also supplies n, so no separate count() job
    val (ranked, cleanup) = DistributedRank.rankedByRange(
      entries.select(idCol.cast("string").as("id"), hashCol.as("value_hash")),
      keys = Nil, order = Seq(col("id").asc), rankCol = "__r", nCol = "__n")
    try {
      val epb = floor(greatest(col("__n"), lit(1L)) / buckets).cast("long")
      ranked
        .withColumn("bucket",
          when(epb === 0, lit(buckets - 1))
            .otherwise(least(col("__r") / epb, lit((buckets - 1).toLong))
              .cast("int")))
        .drop("__r", "__n")
        // materialize before releasing the pinned ranked input; one extra
        // distributed write, traded for never sorting the replica on one core
        .localCheckpoint(true)
    } finally cleanup() // released on the checkpoint-failure path too
  }

  /** Per-bucket hashes (crdt.rs:978-988): within each bucket, ids in
    * sorted order fold as h = h·17 + id_hash + value_hash (wrapping).
    * Output: (bucket, bucket_hash, count, range_start, range_end) — the
    * leaf level of the reference's Merkle tree; internal levels derive
    * from it driver-side and add nothing to the diff set.
    */
  def bucketHashes(entries: DataFrame, idCol: Column, hashCol: Column,
                   bucketCount: Int): DataFrame = {
    val fold = udf { (pairs: Seq[org.apache.spark.sql.Row]) =>
      var h = 0L
      pairs.foreach { r => h = h * 17L + r.getLong(1) + r.getLong(2) }
      h
    }
    bucketed(entries, idCol, hashCol, bucketCount)
      .withColumn("__ih", idHash(col("id")))
      .groupBy(col("bucket"))
      .agg(
        fold(sort_array(collect_list(struct(col("id"), col("__ih"),
          col("value_hash"))))).as("bucket_hash"),
        count(lit(1)).as("count"),
        min(col("id")).as("range_start"), max(col("id")).as("range_end"))
  }

  /** Anti-entropy diff (crdt.rs:935-955): buckets whose hashes differ
    * between two replicas' entry sets. Output: (bucket, hash_a, hash_b,
    * count_a, count_b) for differing buckets only — the ids inside are the
    * sync candidates (keys_in_bucket).
    */
  def merkleDiff(a: DataFrame, b: DataFrame, idCol: Column, hashCol: Column,
                 bucketCount: Int): DataFrame = {
    val ha = bucketHashes(a, idCol, hashCol, bucketCount)
      .select(col("bucket"), col("bucket_hash").as("hash_a"),
        col("count").as("count_a"))
    val hb = bucketHashes(b, idCol, hashCol, bucketCount)
      .select(col("bucket"), col("bucket_hash").as("hash_b"),
        col("count").as("count_b"))
    ha.join(hb, Seq("bucket"), "full_outer")
      .filter(!(col("hash_a") <=> col("hash_b")))
      .orderBy(col("bucket"))
  }
}
