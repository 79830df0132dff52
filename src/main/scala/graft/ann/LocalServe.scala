package graft.ann

import org.apache.spark.sql.functions._

/** Driver-local point-query serving — the in-process answer path for the
  * single-query latency row (reference README.md:75-85: its ~300 QPS
  * single-search number is an in-process HNSW probe with no scheduler in
  * the loop; a Spark job pays a ~0.2 s floor per query regardless of scan
  * size, see BaselineBench `single_*`).
  *
  * HONEST CAVEATS, by design:
  *   - The snapshot is a `collect()`ed COPY of the collection, guarded by
  *     `maxRows` — this mode exists for collections that fit on the
  *     driver (the serving-cache tier every vector DB keeps hot). Larger
  *     collections use the distributed paths ([[Ivf.batchSearchPacked]]).
  *   - It is a snapshot: mutations after [[fromIndex]] are not visible
  *     until re-built. The reference's in-memory index has the same
  *     rebuild-on-mutation character (its inserts rebuild HNSW segments).
  *
  * Results are bit-identical to [[Ivf.search]] at the same (k, nprobe):
  * the same probe algebra ([[Ivf.probeCells]]), the same flat kernels
  * ([[Ivf.flatScoreKernel]]), the same (distance, id) tie order
  * (LocalServeSpec asserts equality row by row). With `simd = true` the
  * f32 [[VectorSimd]] kernel scores instead — recall-contracted rather
  * than bit-identical, like [[Ivf.batchSearchPacked]]'s simd mode.
  */
object LocalServe {

  /** Driver-memory ceiling for the in-process serving tier; REST index
    * builds guard against the same bound before their snapshot sort.
    */
  val DefaultMaxRows: Long = 2000000L

  /** Per-cell flat arrays, driver-resident. `cellPayload` holds one long
    * attribute per row when built with `payloadCol` (for filtered point
    * queries), empty otherwise. `tombstones` marks logically-deleted ids
    * ([[remove]]); the structure is copy-on-write — [[addBatch]] /
    * [[remove]] return a NEW index sharing every untouched cell array,
    * so an in-flight [[search]] on the old snapshot never races a
    * mutation.
    */
  final class LocalIndex(
      val centroids: Array[Array[Float]],
      val metric: String,
      val dims: Int,
      val cellIds: Array[Array[Long]],      // cell -> ids
      val cellVecs: Array[Array[Float]],    // cell -> row-major flat vectors
      val cellNorms2: Array[Array[Double]], // cell -> per-row ||v||² (cosine)
      val cellPayload: Array[Array[Long]],  // cell -> per-row filter attr
      val tombstones: java.util.HashSet[java.lang.Long] =
        new java.util.HashSet[java.lang.Long]()) {
    /** Live row count (inserted minus tombstoned). */
    def liveCount: Long =
      cellIds.iterator.map(_.length.toLong).sum - tombstones.size()
  }

  /** Materialize a driver-local snapshot of an IVF index. One distributed
    * pass; refuses collections beyond `maxRows` (the driver-memory guard —
    * this is the small-collection serving tier, not a general path).
    */
  def fromIndex(ix: Ivf.Index, idCol: String = "id",
                vecCol: String = "vector",
                maxRows: Long = DefaultMaxRows,
                payloadCol: Option[String] = None): LocalIndex = {
    val n = ix.assigned.count()
    require(n <= maxRows,
      s"LocalServe.fromIndex: $n rows exceeds maxRows=$maxRows — " +
        "driver-local serving is for collections that fit on the driver; " +
        "use Ivf.batchSearchPacked for larger ones")
    val dims = ix.centroids.headOption.map(_.length).getOrElse(0)
    val numCells = ix.centroids.length
    val hasPayload = payloadCol.isDefined
    val payC = payloadCol.map(c => col(c).cast("long")).getOrElse(lit(0L))
    val rows = ix.assigned
      .select(col(idCol).cast("long"), col("cell").cast("int"),
        col(vecCol).cast("array<float>"), payC)
      .collect()
    val counts = new Array[Int](numCells)
    rows.foreach(r => counts(r.getInt(1)) += 1)
    val ids = Array.tabulate(numCells)(c => new Array[Long](counts(c)))
    val vecs = Array.tabulate(numCells)(c => new Array[Float](counts(c) * dims))
    val norms2 = Array.tabulate(numCells)(c =>
      if (ix.metric == "cosine") new Array[Double](counts(c))
      else Array.emptyDoubleArray)
    val payload = Array.tabulate(numCells)(c =>
      if (hasPayload) new Array[Long](counts(c)) else Array.emptyLongArray)
    val fill = new Array[Int](numCells)
    rows.foreach { r =>
      val cell = r.getInt(1)
      val i = fill(cell); fill(cell) = i + 1
      ids(cell)(i) = r.getLong(0)
      val v = r.getSeq[Float](2)
      var j = 0; val off = i * dims
      var s = 0.0
      while (j < dims) {
        val x = v(j)
        vecs(cell)(off + j) = x
        s += x.toDouble * x.toDouble
        j += 1
      }
      if (ix.metric == "cosine") norms2(cell)(i) = s
      if (hasPayload) payload(cell)(i) = r.getLong(3)
    }
    new LocalIndex(ix.centroids, ix.metric, dims, ids, vecs, norms2, payload)
  }

  /** Incremental insert — the serve-under-writes path (the reference's
    * in-memory index takes inserts without a rebuild; this is the same
    * contract for the snapshot tier). Each vector lands in its nearest
    * centroid's cell; every touched cell's arrays are copied ONCE per
    * batch (grouped), untouched cells are shared, so the returned index
    * is safe to publish while searches run against the old one. This
    * appends blindly, exactly like the engine's insert (dedup is the
    * caller's policy); replacing a live id = [[remove]] the old id +
    * append under a FRESH surrogate (re-using a tombstoned id is
    * rejected — see the require below).
    *
    * Centroids do NOT move (same as the reference's segment inserts):
    * after heavy drift a rebuild re-balances; `liveCount` vs build size
    * tells the caller when.
    */
  def addBatch(li: LocalIndex,
               rows: Seq[(Long, Array[Float], Long)]): LocalIndex = {
    require(rows.forall(_._2.length == li.dims),
      s"addBatch: vector dims must equal index dims ${li.dims}")
    // clearing a tombstone would resurrect the OLD physical copy along
    // with the new one (an id-level tombstone cannot tell them apart).
    // Replace = tombstone the old id + append under a FRESH surrogate
    // (exactly what RestApi.AnnState.withUpserts does).
    require(rows.forall(r => !li.tombstones.contains(Long.box(r._1))),
      "addBatch: id is tombstoned — rebuild the snapshot, or append " +
        "under a fresh surrogate id (the replace model RestApi uses)")
    // payload tracking continues only when the built index carries it
    // (an EMPTY payload-built index is indistinguishable from a
    // non-payload one — build the payload snapshot from non-empty data)
    val hasPayload = li.cellPayload.exists(_.nonEmpty)
    val byCell = rows.groupBy { case (_, v, _) =>
      Ivf.probeCells(li.centroids, li.metric, v, 1).head
    }
    val ids = li.cellIds.clone()
    val vecs = li.cellVecs.clone()
    val norms2 = li.cellNorms2.clone()
    val payload = li.cellPayload.clone()
    byCell.foreach { case (c, add) =>
      val n0 = ids(c).length
      val n1 = n0 + add.size
      ids(c) = java.util.Arrays.copyOf(ids(c), n1)
      vecs(c) = java.util.Arrays.copyOf(vecs(c), n1 * li.dims)
      if (li.metric == "cosine")
        norms2(c) = java.util.Arrays.copyOf(norms2(c), n1)
      if (hasPayload)
        payload(c) = java.util.Arrays.copyOf(payload(c), n1)
      add.zipWithIndex.foreach { case ((id, v, pay), k) =>
        val i = n0 + k
        ids(c)(i) = id
        System.arraycopy(v, 0, vecs(c), i * li.dims, li.dims)
        if (li.metric == "cosine") norms2(c)(i) = Ivf.norm2(v)
        if (hasPayload) payload(c)(i) = pay
      }
    }
    new LocalIndex(li.centroids, li.metric, li.dims, ids, vecs, norms2,
      payload, li.tombstones)
  }

  /** Logical delete: tombstone ids (cheap, no array surgery); searches
    * skip them. Copy-on-write like [[addBatch]].
    */
  def remove(li: LocalIndex, ids: Seq[Long]): LocalIndex = {
    val tomb = new java.util.HashSet[java.lang.Long](li.tombstones)
    ids.foreach(id => tomb.add(Long.box(id)))
    new LocalIndex(li.centroids, li.metric, li.dims, li.cellIds,
      li.cellVecs, li.cellNorms2, li.cellPayload, tomb)
  }

  /** In-process ANN top-k: probe nprobe cells, exact top-k within —
    * [[Ivf.search]]'s semantics with zero Spark jobs. Returns (id,
    * distance) sorted by (distance, id) ascending.
    *
    * The probed scan is chunked and run on the common fork-join pool:
    * clustered corpora make the probed cells exactly the DENSE ones, so a
    * sequential scan serializes on the skew. Per-chunk [[Ivf.TopBuf]]s
    * merge deterministically (k-smallest with (score, id) ties is
    * insertion-order-insensitive).
    */
  def search(li: LocalIndex, query: Array[Float], k: Int,
             nprobe: Int,
             payloadPred: Option[Long => Boolean] = None,
             simd: Boolean = false): Array[(Long, Double)] = {
    val cells = Ivf.probeCells(li.centroids, li.metric, query, nprobe)
    val score = Ivf.pickFlatKernel(li.metric, simd)
    val needsNorm = li.metric == "cosine"
    val qn2 = if (needsNorm) Ivf.norm2(query) else 0.0
    val pred: Long => Boolean = payloadPred.orNull
    val chunk = 4096
    val tasks = cells.flatMap { c =>
      val n = li.cellIds(c).length
      (0 until n by chunk).map(from => (c, from, math.min(from + chunk, n)))
    }.toArray
    // tombstone check only when deletions exist — the common no-delete
    // scan stays branch-free
    val tomb =
      if (li.tombstones.isEmpty) null else li.tombstones
    val bufs = new Array[Ivf.TopBuf](tasks.length)
    java.util.stream.IntStream.range(0, tasks.length).parallel().forEach { t =>
      val (c, from, until) = tasks(t)
      val ids = li.cellIds(c)
      val vecs = li.cellVecs(c)
      val norms2 = li.cellNorms2(c)
      val payload = li.cellPayload(c)
      if (pred != null) require(payload.length == ids.length,
        "payloadPred requires an index built with payloadCol")
      val buf = new Ivf.TopBuf(k)
      var i = from
      while (i < until) {
        if ((pred == null || pred(payload(i))) &&
            (tomb == null || !tomb.contains(ids(i)))) {
          val vn2 = if (needsNorm) norms2(i) else 0.0
          buf.insert(score(vecs, i * li.dims, li.dims, query, vn2, qn2), ids(i))
        }
        i += 1
      }
      bufs(t) = buf
    }
    val merged = new Ivf.TopBuf(k)
    bufs.foreach { b =>
      var i = 0
      while (i < b.n) { merged.insert(b.scores(i), b.ids(i)); i += 1 }
    }
    Array.tabulate(merged.n)(i => (merged.ids(i), merged.scores(i)))
  }
}
