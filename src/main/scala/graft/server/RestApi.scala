package graft.server

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.filter.{Filter, FilterCompiler}
import graft.functions.Distances
import graft.ops.Search

/** REST contract layer (SURVEY §3.2 scoped it out of core; built as the
  * drop-in surface a reference server user would call — reference:
  * src/server/mod.rs:462-537 route table, src/server/types.rs request/
  * response bodies, src/server/handlers/{collections,vectors,search}.rs).
  *
  * Shape parity kept exactly where the reference defines it:
  *   - error body `{"error": msg, "code": CODE}` (types.rs:12-19)
  *   - `score = 1 / (1 + distance)` (handlers/search.rs:187)
  *   - create → 201 `{"created": name}`; collection info with
  *     `needs_compaction` at the 0.2 ratio (handlers/collections.rs:111,127)
  *   - list pagination `{count, offset, total, has_more}`
  *   - metadata-only `/query` and filtered `/count` (handlers/search.rs:
  *     964-1057), `/recommend` positive/negative ids (:1060-1140)
  *   - search_after cursor `{distance, id}` paging (types.rs:180-243)
  *
  * Execution is the engine's own declarative ops (Search.topK/radius/
  * searchAfter, FilterCompiler, VectorAgg centroids) over a per-collection
  * DataFrame — handlers never loop over rows on the driver, so a
  * collection can be a registered parquet table of any size; only the
  * k-bounded result page is collected. [[handle]] is a pure
  * (method, path, body) → (status, json) function so the whole contract is
  * testable in-process; [[serve]] hosts it on the JDK's HttpServer (no new
  * dependencies), one Spark job per request like any multi-tenant driver.
  *
  * Cluster caveats (the honest scope of this contract layer):
  *   - mutations keep lineage O(1) via `localCheckpoint(false)`, whose
  *     blocks live on executors — correct for a single long-lived driver
  *     app, but LOSSY under dynamic allocation / executor loss. On a real
  *     cluster, route mutations to a transactional table format and keep
  *     this layer read-mostly over [[register]]ed tables.
  *   - the collection registry is driver-local (single-process); writers
  *     mutate under `synchronized` and readers see fresh state via the
  *     `@volatile` fields, so concurrent in-process callers are safe, but
  *     two driver processes would each have their own registry.
  */
class RestApi(spark: SparkSession) {

  import RestApi._

  /** Mutable collection state, reference Collection ≙ one DataFrame:
    * (id STRING, vector ARRAY<FLOAT>, metadata STRING json, ttl LONG).
    */
  final case class Coll(name: String, dims: Int, metric: String,
                        @volatile var df: DataFrame,
                        @volatile var deleted: Long = 0L,
                        @volatile var ann: AnnState = null)

  /** Driver-resident ANN serving state for one collection: a LocalServe
    * snapshot (the in-process point-query tier — zero Spark jobs per
    * search) plus the surrogate-id ↔ string-id mapping. Mutations keep
    * the snapshot LIVE — inserts append into their nearest cell
    * (copy-on-write, `LocalServe.addBatch`), deletes/replacements
    * tombstone (`LocalServe.remove`), the same serve-under-writes
    * contract as the reference's in-memory segments. Centroids do not
    * move on insert, so after heavy drift `POST /collections/{c}/index`
    * re-balances; rows whose TTL expires after the build are served
    * until the next rebuild.
    */
  final case class AnnState(li: graft.ann.LocalServe.LocalIndex,
                            ids: Array[String], numCells: Int,
                            nprobe: Int, rows: Long,
                            idToSid: java.util.HashMap[String, Integer]) {
    /** Inserts append, replaced ids tombstone first; returns the next
      * published state (copy-on-write snapshot + updated mappings).
      */
    def withUpserts(rows0: Seq[(String, Array[Float])]): AnnState = {
      val replaced = rows0.flatMap { case (id, _) =>
        Option(idToSid.get(id)).map(_.longValue())
      }
      val li1 = if (replaced.nonEmpty)
        graft.ann.LocalServe.remove(li, replaced) else li
      var next = ids.length
      val newIds = java.util.Arrays.copyOf(ids, ids.length + rows0.size)
      val map = new java.util.HashMap[String, Integer](idToSid)
      val adds = rows0.map { case (id, v) =>
        val sid = next; next += 1
        newIds(sid) = id
        map.put(id, Int.box(sid))
        (sid.toLong, v, 0L)
      }
      AnnState(graft.ann.LocalServe.addBatch(li1, adds), newIds,
        numCells, nprobe, rows + rows0.size - replaced.size, map)
    }

    /** Tombstones deleted ids; unknown ids are no-ops. */
    def withDeletes(deleted: Seq[String]): AnnState = {
      val sids = deleted.flatMap(id =>
        Option(idToSid.get(id)).map(_.longValue()))
      if (sids.isEmpty) this
      else {
        val map = new java.util.HashMap[String, Integer](idToSid)
        deleted.foreach(map.remove(_))
        AnnState(graft.ann.LocalServe.remove(li, sids), ids, numCells,
          nprobe, rows - sids.size, map)
      }
    }
  }

  private val collections = mutable.LinkedHashMap.empty[String, Coll]
  private val mapper = new ObjectMapper()

  private val schema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("vector", ArrayType(FloatType), nullable = false),
    StructField("metadata", StringType, nullable = true),
    StructField("ttl_expires_at", LongType, nullable = true)))

  /** Register an EXISTING DataFrame (e.g. a parquet table) as a
    * collection — the Spark-native superpower the reference's in-process
    * store lacks; the REST surface then serves it unchanged.
    */
  def register(name: String, df: DataFrame, dims: Int,
               metric: String = "cosine"): Unit = synchronized {
    collections(name) = Coll(name, dims, metric, df.select(
      col("id").cast("string").as("id"),
      col("vector").cast("array<float>").as("vector"),
      (if (df.columns.contains("metadata")) col("metadata").cast("string")
       else lit(null).cast("string")).as("metadata"),
      (if (df.columns.contains("ttl_expires_at")) col("ttl_expires_at").cast("long")
       else lit(null).cast("long")).as("ttl_expires_at")))
  }

  /** The configured distance metric of a collection (None when absent).
    * The REST CollectionInfo deliberately omits it (reference types.rs
    * parity); front-ends that need it (GraphQL's distanceFunction field)
    * read it here instead of widening the REST contract.
    */
  def collectionMetric(name: String): Option[String] =
    synchronized(collections.get(name).map(_.metric))

  // ------------------------------------------------------------- dispatch

  /** The whole API as a pure function: (method, path, body) → (status,
    * response json). Query params ride on the path (`?offset=..`).
    */
  def handle(method: String, rawPath: String, body: String): (Int, String) = {
    val (path, params) = splitQuery(rawPath)
    // percent-decode AFTER splitting on '/': an id containing an encoded
    // '/' or '&' must stay one segment
    val parts = path.stripPrefix("/").stripSuffix("/").split("/").toList
      .map(urlDecode)
    try {
      (method.toUpperCase(java.util.Locale.ROOT), parts) match {
        case ("GET", List("health")) => ok(obj(_.put("status", "ok")))
        case ("GET", List("collections")) => listCollections(params)
        case ("POST", List("collections")) => createCollection(body)
        case ("GET", List("collections", name)) => getCollection(name)
        case ("DELETE", List("collections", name)) => deleteCollection(name)
        case ("POST", List("collections", name, "rename")) =>
          renameCollection(name, body)
        case ("GET", List("collections", c, "vectors")) =>
          listVectors(c, params)
        case ("GET", List("collections", c, "vectors", id)) => getVector(c, id)
        case ("DELETE", List("collections", c, "vectors", id)) =>
          deleteVectors(c, Seq(id))
        case ("POST", List("collections", c, "vectors")) =>
          insert(c, Seq(mapper.readTree(body)), upsertMode = false)
        case ("POST", List("collections", c, "vectors", "batch")) =>
          insert(c, arr(mapper.readTree(body).get("vectors")), upsertMode = false)
        case ("POST", List("collections", c, "vectors", "upsert")) =>
          insert(c, Seq(mapper.readTree(body)), upsertMode = true)
        case ("POST", List("collections", c, "vectors", "upsert-batch")) =>
          insert(c, arr(mapper.readTree(body).get("vectors")), upsertMode = true)
        case ("POST", List("collections", c, "vectors", "delete-batch")) =>
          deleteVectors(c, arr(mapper.readTree(body).get("ids")).map(_.asText()))
        case ("POST", List("collections", c, "index")) => buildIndex(c, body)
        case ("GET", List("collections", c, "index")) => indexStatus(c)
        case ("DELETE", List("collections", c, "index")) => dropIndex(c)
        case ("POST", List("collections", c, "search")) => search(c, body)
        case ("POST", List("collections", c, "search", "batch")) =>
          batchSearch(c, body)
        case ("POST", List("collections", c, "search", "radius")) =>
          radiusSearch(c, body)
        case ("POST", List("collections", c, "count")) => countFiltered(c, body)
        case ("POST", List("collections", c, "query")) => metadataQuery(c, body)
        case ("POST", List("collections", c, "recommend")) => recommend(c, body)
        case _ => err(404, s"no route for $method $path", "NOT_FOUND")
      }
    } catch {
      case e: ApiException => err(e.status, e.message, e.code)
      case e: com.fasterxml.jackson.core.JacksonException =>
        err(400, s"Invalid JSON: ${e.getMessage}", "INVALID_JSON")
      case e: IllegalArgumentException =>
        err(400, String.valueOf(e.getMessage), "BAD_REQUEST")
    }
  }

  // ---------------------------------------------------------- collections

  private def listCollections(params: Map[String, String]): (Int, String) =
    synchronized {
      val offset = params.get("offset").map(_.toInt).getOrElse(0)
      val limit = params.get("limit").map(_.toInt).getOrElse(100)
      val all = collections.values.toSeq
      val page = all.slice(offset, offset + limit)
      ok(obj { o =>
        val a = o.putArray("collections")
        page.foreach { c =>
          val e = a.addObject()
          e.put("name", c.name).put("dimensions", c.dims)
          e.put("count", c.df.count()).put("deleted_count", c.deleted)
        }
        val p = o.putObject("pagination")
        p.put("count", page.size).put("offset", offset).put("total", all.size)
        p.put("has_more", offset + page.size < all.size)
      })
    }

  private def createCollection(body: String): (Int, String) = synchronized {
    val req = mapper.readTree(body)
    val name = require(req, "name").asText()
    val dims = require(req, "dimensions").asInt()
    if (name.isEmpty || !name.matches("[A-Za-z0-9_.-]{1,128}"))
      throw ApiException(400, s"Invalid collection name: $name", "INVALID_NAME")
    if (dims < 1 || dims > 16384) // reference MAX_DIMENSIONS guard
      throw ApiException(400, "Dimensions must be between 1 and 16384",
        "INVALID_DIMENSIONS")
    if (collections.contains(name))
      throw ApiException(409, s"Collection already exists: $name",
        "ALREADY_EXISTS")
    val metric = Option(req.get("distance")).map(_.asText()).getOrElse("cosine")
    collections(name) = Coll(name, dims, metric,
      spark.createDataFrame(java.util.Collections.emptyList[Row](), schema))
    (201, mapper.writeValueAsString(obj2(_.put("created", name))))
  }

  private def coll(name: String): Coll = synchronized {
    collections.getOrElse(name,
      throw ApiException(404, s"Collection not found: $name", "NOT_FOUND"))
  }

  private def getCollection(name: String): (Int, String) = {
    val c = coll(name)
    val n = c.df.count()
    ok(obj { o =>
      o.put("name", name).put("dimensions", c.dims).put("count", n)
      o.put("deleted_count", c.deleted)
      // reference needs_compaction(0.2) (handlers/collections.rs:127)
      o.put("needs_compaction", c.deleted.toDouble > 0.2 * math.max(1L, n + c.deleted))
    })
  }

  private def deleteCollection(name: String): (Int, String) = synchronized {
    coll(name) // 404 when absent
    collections.remove(name)
    ok(obj(_.put("deleted", name)))
  }

  /** Rename (reference: db.rename_collection, exposed through MCP): the
    * registry key moves, the DataFrame is untouched.
    */
  private def renameCollection(name: String, body: String): (Int, String) =
    synchronized {
      val c = coll(name)
      val newName = require(mapper.readTree(body), "new_name").asText()
      if (newName.isEmpty || !newName.matches("[A-Za-z0-9_.-]{1,128}"))
        throw ApiException(400, s"Invalid collection name: $newName",
          "INVALID_NAME")
      if (collections.contains(newName))
        throw ApiException(409, s"Collection already exists: $newName",
          "ALREADY_EXISTS")
      collections.remove(name)
      collections(newName) = c.copy(name = newName)
      ok(obj(o => o.put("old_name", name).put("new_name", newName)
        .put("renamed", true)))
    }

  // -------------------------------------------------------------- vectors

  private def insert(name: String, reqs: Seq[JsonNode],
                     upsertMode: Boolean): (Int, String) = {
    val c = coll(name)
    val rows = reqs.map { r =>
      val id = require(r, "id").asText()
      val vec = arr(require(r, "vector")).map(_.floatValue()).toArray
      if (vec.length != c.dims)
        throw ApiException(400,
          s"Vector dimension ${vec.length} != collection dimension ${c.dims}",
          "DIMENSION_MISMATCH")
      val meta = Option(r.get("metadata")).filterNot(_.isNull)
        .map(mapper.writeValueAsString)
      val ttl = Option(r.get("ttl_seconds")).filterNot(_.isNull)
        .map(t => nowEpochS() + t.asLong())
      Row(id, vec.toSeq, meta.orNull, ttl.map(Long.box).orNull)
    }
    val ids = rows.map(_.getString(0))
    // within-batch duplicates: an insert batch must be id-unique (the
    // second insert of an id is a conflict); an upsert batch keeps the
    // LAST occurrence, matching sequential upsert semantics
    val dedupedRows =
      if (upsertMode) rows.groupBy(_.getString(0)).map(_._2.last).toSeq
      else {
        if (ids.distinct.size != ids.size)
          throw ApiException(409, "Duplicate vector id within batch",
            "DUPLICATE_ID")
        rows
      }
    val incoming = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(dedupedRows).asJava), schema)
    synchronized {
      if (!upsertMode) {
        val clash = c.df.filter(col("id").isin(ids: _*)).limit(1).count()
        if (clash > 0)
          throw ApiException(409, "Vector id already exists", "DUPLICATE_ID")
      }
      c.df = c.df.filter(!col("id").isin(ids: _*)).unionByName(incoming)
        .localCheckpoint(false) // keep the lineage O(1) across mutations
      // keep the ANN snapshot live: appended rows enter their nearest
      // cell, replaced ids tombstone (LocalServe copy-on-write). Rows
      // carrying a TTL fall back to invalidation — the snapshot has no
      // expiry clock, so serving them past expiry would be wrong.
      if (c.ann != null) {
        if (dedupedRows.exists(_.get(3) != null)) c.ann = null
        else c.ann = c.ann.withUpserts(dedupedRows.map(r =>
          (r.getString(0), r.getSeq[Float](1).toArray)))
      }
    }
    ok(obj(_.put(if (upsertMode) "upserted" else "inserted",
      dedupedRows.size)))
  }

  private def deleteVectors(name: String, ids: Seq[String]): (Int, String) = {
    val c = coll(name)
    synchronized {
      val n = c.df.filter(col("id").isin(ids: _*)).count()
      if (n == 0 && ids.size == 1)
        throw ApiException(404, s"Vector not found: ${ids.head}", "NOT_FOUND")
      c.df = c.df.filter(!col("id").isin(ids: _*)).localCheckpoint(false)
      if (c.ann != null) c.ann = c.ann.withDeletes(ids)
      c.deleted += n
      ok(obj(_.put("deleted", n)))
    }
  }

  /** Keyset-paged vector listing (reference handlers/vector.rs list):
    * `?after_id=&limit=` — each page is `WHERE id > cursor ORDER BY id
    * LIMIT n`, constant cost at any depth, only the page is collected.
    */
  private def listVectors(name: String,
                          params: Map[String, String]): (Int, String) = {
    val c = coll(name)
    val limit = math.min(math.max(
      params.get("limit").map(_.toInt).getOrElse(100), 1), 1000)
    val afterId = params.get("after_id")
    val base = liveRows(c)
    // fetch limit+1: has_more from the presence of the extra row, so an
    // exact-boundary final page does not advertise a phantom next page
    val fetched = afterId.fold(base)(cur => base.filter(col("id") > cur))
      .orderBy(col("id")).limit(limit + 1).collect()
    val page = fetched.take(limit)
    ok(obj { o =>
      val rs = o.putArray("vectors")
      page.foreach { r =>
        val e = rs.addObject()
        e.put("id", r.getString(0))
        val v = e.putArray("vector")
        r.getSeq[Float](1).foreach(v.add(_))
        e.set[ObjectNode]("metadata", metaNode(r.getAs[String]("metadata")))
      }
      val p = o.putObject("pagination")
      p.put("count", page.length).put("has_more", fetched.length > limit)
      if (page.nonEmpty) p.put("next_after_id", page.last.getString(0))
    })
  }

  private def getVector(name: String, id: String): (Int, String) = {
    val c = coll(name)
    val rows = c.df.filter(col("id") === id).limit(1).collect()
    if (rows.isEmpty)
      throw ApiException(404, s"Vector not found: $id", "NOT_FOUND")
    val r = rows.head
    ok(obj { o =>
      o.put("id", id)
      val v = o.putArray("vector")
      r.getSeq[Float](1).foreach(v.add(_))
      o.set[ObjectNode]("metadata", metaNode(r.getAs[String]("metadata")))
    })
  }

  // --------------------------------------------------------------- search

  /** Pre-filter compiled against metadata JSON paths, exactly the
    * reference's filter-during-search contract (types.rs:198-200).
    */
  private def compiledFilter(c: Coll, node: JsonNode): Option[Column] =
    Option(node).filterNot(_.isNull).map { f =>
      val filter = Filter.parse(mapper.writeValueAsString(f))
      FilterCompiler.compile(filter,
        (path: String) => FilterCompiler.schemaResolver(c.df.schema)(
          s"metadata.$path"))
    }

  private def liveRows(c: Coll): DataFrame =
    c.df.filter(col("ttl_expires_at").isNull ||
      col("ttl_expires_at") > nowEpochS())

  /** Build the driver-resident ANN serving tier over the collection's
    * live snapshot: assign a dense surrogate id (string ids must become
    * longs for the packed arrays — the single-partition window is a
    * one-off build pass over a registry-sized, `maxRows`-guarded
    * collection), fit IVF centroids, collect into a LocalServe snapshot.
    * After this, `{"mode":"ann"}` searches answer in-process with zero
    * Spark jobs — the reference's in-memory serving model.
    *
    * `maxRows` exists as a parameter (route calls always pass the 2M
    * default) solely so the refusal branch is executable in-suite —
    * RestApiSpec pins that the CHEAP pre-guard fires (its "collection
    * exceeds" message, distinct from the post-checkpoint guard's
    * "N rows exceeds") before any ranking/checkpoint work.
    */
  private[graft] def buildIndex(name: String, body: String,
      maxRows: Long = graft.ann.LocalServe.DefaultMaxRows)
      : (Int, String) = {
    val c = coll(name)
    val req = if (body == null || body.isBlank) mapper.createObjectNode()
              else mapper.readTree(body)
    val numCells = boundedInt(req, "num_cells", default = 16, max = 4096)
    val nprobe = boundedInt(req, "nprobe",
      default = math.max(1, numCells / 4), max = numCells)
    // Dense surrogate ids via the distributed global rank — same
    // id-ordered assignment the former Window.orderBy produced, with no
    // single-partition sort — checkpointed ONCE: the eager checkpoint
    // pins one set of live rows, so the guard's count below and the data
    // every later stage reads are the same rows (no TOCTOU window
    // against concurrent upserts; rows written after this point simply
    // aren't in the index — the documented serve-under-writes behavior).
    // rankedByRange's internal pin is explicitly released; only this one
    // snapshot remains, with the same lifecycle the pre-r14 snapshot
    // had.
    // Cheap pre-guard BEFORE any ranking/checkpoint work: a limit(N+1)
    // count costs one narrow scan and refuses an oversized collection
    // without materializing it (pre-r14 protective behavior restored —
    // without this, a single misuse REST call would rank + eagerly
    // checkpoint the whole corpus before the 4xx). The post-checkpoint
    // count below stays the authoritative race-free bound.
    // limit() takes an Int: clamp a Long maxRows at or above Int.MaxValue
    // instead of letting .toInt overflow into a tiny/negative limit.
    val preCount =
      liveRows(c).limit(math.min(maxRows, Int.MaxValue - 1L).toInt + 1).count()
    Predef.require(preCount <= maxRows,
      s"build_index('$name'): collection exceeds the in-process serving " +
        s"bound ($maxRows); use Ivf.batchSearchPacked for collections " +
        "this large")
    val snap = {
      val (ranked, release) = graft.ops.DistributedRank.rankedByRange(
        liveRows(c).select(col("id"), col("vector")),
        Nil, Seq(col("id")), "__r", "__n")
      try ranked.withColumn("__sid", col("__r").cast("long"))
        .drop("__r", "__n")
        .localCheckpoint(true) // one stable snapshot feeds guard + build + mapping
      finally release()
    }
    val nLive = snap.count() // counts checkpointed blocks — no rescan
    Predef.require(nLive <= maxRows,
      s"build_index('$name'): $nLive rows exceeds the in-process serving " +
        s"bound ($maxRows); use " +
        "Ivf.batchSearchPacked for collections this large")
    val ix = graft.ann.Ivf.build(snap, col("vector"), numCells, c.metric)
    val li = graft.ann.LocalServe.fromIndex(ix, "__sid", "vector")
    val ids = snap.orderBy(col("__sid")).select("id").collect()
      .map(_.getString(0))
    synchronized {
      val map = new java.util.HashMap[String, Integer](ids.length * 2)
      ids.zipWithIndex.foreach { case (id, sid) => map.put(id, Int.box(sid)) }
      c.ann = AnnState(li, ids, numCells, nprobe, ids.length.toLong, map)
    }
    ok(obj { o =>
      o.put("indexed", ids.length); o.put("num_cells", numCells)
      o.put("nprobe", nprobe)
    })
  }

  private def indexStatus(name: String): (Int, String) = {
    val a = coll(name).ann
    ok(obj { o =>
      o.put("built", a != null)
      if (a != null) {
        o.put("rows", a.rows); o.put("num_cells", a.numCells)
        o.put("nprobe", a.nprobe)
      }
    })
  }

  private def dropIndex(name: String): (Int, String) = {
    val c = coll(name)
    synchronized { c.ann = null }
    ok(obj(_.put("dropped", true)))
  }

  /** `{"mode":"ann"}` search: answered from the LocalServe snapshot
    * in-process. Results carry id + distance (fetch metadata via
    * `GET /vectors/{id}` when needed — the snapshot holds vectors, not
    * metadata); filters and cursors stay on the exact path.
    */
  private def annSearch(c: Coll, req: JsonNode): (Int, String) = {
    val ann = c.ann
    if (ann == null)
      throw ApiException(409, "no ANN index for this collection — " +
        "POST /collections/{name}/index (mutations invalidate it)",
        "NO_INDEX")
    val qv = arr(require(req, "vector")).map(_.floatValue()).toArray
    val k = boundedInt(req, "k", default = 10, max = 1000)
    val nprobe = boundedInt(req, "nprobe", default = ann.nprobe,
      max = ann.numCells)
    if (Option(req.get("distance")).filterNot(_.isNull)
        .exists(_.asText() != c.metric))
      throw ApiException(400,
        s"ann mode serves the index metric '${c.metric}'",
        "INVALID_DISTANCE")
    if (req.has("filter") && !req.get("filter").isNull)
      throw ApiException(400,
        "ann mode does not support filters; use exact mode", "INVALID_FILTER")
    // {"kernel":"simd"} opts into the f32 SIMD scoring kernel
    // (recall-contracted, not bit-identical — see Ivf.batchSearchPacked);
    // silently scalar when the vector module is absent in this JVM.
    val simd = Option(req.get("kernel")).filterNot(_.isNull)
      .exists(_.asText() == "simd")
    val hits = graft.ann.LocalServe.search(ann.li, qv, k, nprobe, simd = simd)
    ok(obj { o =>
      o.put("mode", "ann"); o.put("nprobe", nprobe)
      val rs = o.putArray("results")
      hits.foreach { case (sid, d) =>
        val r = rs.addObject()
        r.put("id", ann.ids(sid.toInt)); r.put("distance", d)
      }
    })
  }

  private def search(name: String, body: String): (Int, String) = {
    val c = coll(name)
    val req = mapper.readTree(body)
    val mode = Option(req.get("mode")).filterNot(_.isNull).map(_.asText())
      .getOrElse("exact")
    if (mode == "ann") return annSearch(c, req)
    if (mode != "exact")
      throw ApiException(400, s"unknown search mode: $mode", "INVALID_MODE")
    val qv = arr(require(req, "vector")).map(_.floatValue()).toArray
    val k = boundedInt(req, "k", default = 10, max = 1000)
    val metric = Option(req.get("distance")).filterNot(_.isNull)
      .map(_.asText()).getOrElse(c.metric)
    val includeVectors = Option(req.get("include_vectors"))
      .exists(_.asBoolean(false))
    val base0 = liveRows(c)
    val base = compiledFilter(c, req.get("filter"))
      .map(base0.filter).getOrElse(base0)
    val postFilter = Option(req.get("post_filter")).filterNot(_.isNull)
      .map(pf => compiledFilter(c, pf).get)
    val factor = Option(req.get("post_filter_factor"))
      .map(_.asInt()).getOrElse(3)
    val cursor = Option(req.get("search_after")).filterNot(_.isNull)
    val hits = cursor match {
      case Some(cur) =>
        val after = Search.searchAfter(base, col("vector"),
          lit(qv), if (postFilter.isDefined) k * factor else k,
          require(cur, "distance").asDouble(),
          require(cur, "id").asText(), metric)
        // post_filter applies to EVERY page of a cursor walk, same
        // over-fetch-then-filter shape as page 1
        postFilter.map(after.filter(_).limit(k)).getOrElse(after)
      case None =>
        postFilter match {
          case Some(pf) => // over-fetch k·factor, post-filter, cut to k
            Search.topK(base, col("vector"), lit(qv), k * factor, metric)
              .filter(pf).limit(k)
          case None => Search.topK(base, col("vector"), lit(qv), k, metric)
        }
    }
    val page = hits.collect()
    ok(obj { o =>
      val rs = o.putArray("results")
      page.foreach(r => resultNode(rs.addObject(), r, includeVectors))
      o.put("has_more", page.length == k)
      if (page.length == k) {
        val cur = o.putObject("next_cursor")
        cur.put("distance", page.last.getAs[Double]("distance"))
        cur.put("id", page.last.getString(0))
      }
    })
  }

  private def batchSearch(name: String, body: String): (Int, String) = {
    val c = coll(name)
    val req = mapper.readTree(body)
    val k = boundedInt(req, "k", default = 10, max = 1000)
    val base0 = liveRows(c)
    val base = compiledFilter(c, req.get("filter")).map(base0.filter)
      .getOrElse(base0)
    val queries = arr(require(req, "vectors")).zipWithIndex.map {
      case (v, i) => (i, arr(v).map(_.floatValue()).toArray.toSeq)
    }
    val qdf = spark.createDataFrame(
      spark.sparkContext.parallelize(queries.map(q => Row(q._1, q._2)), 1),
      StructType(Seq(StructField("query_id", IntegerType),
        StructField("query_vector", ArrayType(FloatType)))))
    // one scored pass for ALL queries (batchTopKPairs' bounded aggregate
    // needs long ids; REST ids are strings, so use the windowed form)
    val winners = Search.batchTopK(base, qdf, k, metric = c.metric)
      .select(col("query_id"), col("id"), col("distance"))
      .collect().groupBy(_.getAs[Int]("query_id"))
    ok(obj { o =>
      val out = o.putArray("results")
      queries.foreach { case (qid, _) =>
        val batch = out.addArray()
        winners.getOrElse(qid, Array.empty).sortBy(r =>
          (r.getAs[Double]("distance"), r.getAs[String]("id"))).foreach { r =>
          val e = batch.addObject()
          val d = r.getAs[Double]("distance")
          e.put("id", String.valueOf(r.getAs[Any]("id")))
          e.put("distance", d).put("score", 1.0 / (1.0 + d))
        }
      }
    })
  }

  private def radiusSearch(name: String, body: String): (Int, String) = {
    val c = coll(name)
    val req = mapper.readTree(body)
    val qv = arr(require(req, "vector")).map(_.floatValue()).toArray
    val maxDist = require(req, "max_distance").asDouble()
    val limit = boundedInt(req, "limit", default = 1000, max = 10000)
    val includeVectors = Option(req.get("include_vectors"))
      .exists(_.asBoolean(false))
    val base0 = liveRows(c)
    val base = compiledFilter(c, req.get("filter")).map(base0.filter)
      .getOrElse(base0)
    val page = Search.radius(base, col("vector"), lit(qv), maxDist, limit,
      c.metric).collect()
    ok(obj { o =>
      val rs = o.putArray("results")
      page.foreach(r => resultNode(rs.addObject(), r, includeVectors))
      o.put("count", page.length)
    })
  }

  private def countFiltered(name: String, body: String): (Int, String) = {
    val c = coll(name)
    val req = mapper.readTree(if (body.isEmpty) "{}" else body)
    val base = compiledFilter(c, req.get("filter"))
      .map(liveRows(c).filter).getOrElse(liveRows(c))
    ok(obj(_.put("count", base.count())))
  }

  private def metadataQuery(name: String, body: String): (Int, String) = {
    val c = coll(name)
    val req = mapper.readTree(body)
    val limit = boundedInt(req, "limit", default = 100, max = 1000)
    // offset is capped like the radius limit: `limit(offset+limit)` is
    // collected on the driver, so an unbounded offset would materialize
    // the whole collection; `after_id` keyset paging is the scale path —
    // every page is `WHERE id > cursor ORDER BY id LIMIT n`, constant
    // cost at any depth
    val offset = Option(req.get("offset")).map(_.asInt()).getOrElse(0)
    if (offset < 0 || offset > 10000)
      throw ApiException(400, "offset must be between 0 and 10000",
        "INVALID_OFFSET")
    val afterId = Option(req.get("after_id")).filterNot(_.isNull)
      .map(_.asText())
    if (afterId.isDefined && offset != 0)
      throw ApiException(400, "after_id and offset are mutually exclusive",
        "INVALID_CURSOR")
    val filter = compiledFilter(c, req.get("filter")).getOrElse(
      throw ApiException(400, "filter is required", "MISSING_FILTER"))
    val matched = liveRows(c).filter(filter)
    val total = matched.count()
    // keyset page fetches limit+1 rows: has_more comes from the presence
    // of the extra row, never from an exactly-full page
    val fetched = afterId match {
      case Some(cur) => matched.filter(col("id") > cur)
        .orderBy(col("id")).limit(limit + 1).collect()
      case None => matched.orderBy(col("id"))
        .limit(offset + limit).collect().drop(offset)
    }
    val page = if (afterId.isDefined) fetched.take(limit) else fetched
    ok(obj { o =>
      val rs = o.putArray("data")
      page.foreach { r =>
        val e = rs.addObject()
        e.put("id", r.getString(0))
        e.set[ObjectNode]("metadata", metaNode(r.getAs[String]("metadata")))
      }
      val p = o.putObject("pagination")
      p.put("count", page.length).put("offset", offset).put("total", total)
      val more = afterId.isDefined && fetched.length > limit ||
        afterId.isEmpty && total > offset + limit
      p.put("has_more", more)
      if (page.nonEmpty && more) p.put("next_after_id", page.last.getString(0))
    })
  }

  private def recommend(name: String, body: String): (Int, String) = {
    val c = coll(name)
    val req = mapper.readTree(body)
    val pos = arr(require(req, "positive_ids")).map(_.asText())
    if (pos.isEmpty)
      throw ApiException(400, "positive_ids must not be empty",
        "EMPTY_POSITIVE_IDS")
    if (pos.size > 100)
      throw ApiException(400, "positive_ids exceeds maximum of 100",
        "TOO_MANY_POSITIVE_IDS")
    val neg = Option(req.get("negative_ids")).map(arr(_).map(_.asText()))
      .getOrElse(Nil)
    val limit = boundedInt(req, "limit", default = 10, max = 1000)
    val page = Search.recommend(liveRows(c), col("vector"), col("id"),
      pos, neg, limit, c.metric).collect()
    ok(obj { o =>
      val rs = o.putArray("results")
      page.foreach { r =>
        val e = rs.addObject()
        val d = r.getAs[Double]("distance")
        e.put("id", String.valueOf(r.getAs[Any]("id")))
        e.put("distance", d).put("score", 1.0 / (1.0 + d))
      }
    })
  }

  // ---------------------------------------------------------------- host

  /** Host [[handle]] on the JDK HttpServer; returns the bound port. */
  def serve(port: Int = 0): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      val (status, resp) = handle(ex.getRequestMethod,
        ex.getRequestURI.toString, body)
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    server
  }

  // ------------------------------------------------------------- plumbing

  /** Injectable clock for TTL tests. */
  var nowEpochS: () => Long = () => System.currentTimeMillis() / 1000L

  private def resultNode(e: ObjectNode, r: Row,
                         includeVectors: Boolean): Unit = {
    val d = r.getAs[Double]("distance")
    e.put("id", r.getString(0))
    e.put("distance", d)
    e.put("score", 1.0 / (1.0 + d)) // handlers/search.rs:187
    e.set[ObjectNode]("metadata", metaNode(r.getAs[String]("metadata")))
    if (includeVectors) {
      val v = e.putArray("vector")
      r.getSeq[Float](r.fieldIndex("vector")).foreach(v.add(_))
    }
  }

  private def metaNode(metaJson: String): JsonNode =
    if (metaJson == null) mapper.nullNode() else mapper.readTree(metaJson)

  private def obj(f: ObjectNode => Unit): String = {
    val o = mapper.createObjectNode(); f(o); mapper.writeValueAsString(o)
  }
  private def obj2(f: ObjectNode => Unit): ObjectNode = {
    val o = mapper.createObjectNode(); f(o); o
  }
  private def ok(json: String): (Int, String) = (200, json)
  private def err(status: Int, msg: String, code: String): (Int, String) =
    (status, obj { o => o.put("error", msg); o.put("code", code) })

  /** Read an optional positive int, rejecting non-positive values with a
    * 400 (reference guard: k/limit must be >= 1) and capping the top end.
    */
  private def boundedInt(n: JsonNode, field: String, default: Int,
                         max: Int): Int = {
    val v = Option(n.get(field)).filterNot(_.isNull).map(_.asInt())
      .getOrElse(default)
    if (v < 1)
      throw ApiException(400, s"$field must be a positive integer",
        "INVALID_" + field.toUpperCase(java.util.Locale.ROOT))
    math.min(v, max)
  }

  private def require(n: JsonNode, field: String): JsonNode = {
    val v = n.get(field)
    if (v == null || v.isNull)
      throw ApiException(400, s"$field is required",
        "MISSING_" + field.toUpperCase(java.util.Locale.ROOT))
    v
  }

  private def arr(n: JsonNode): Seq[JsonNode] = {
    if (n == null || !n.isArray)
      throw ApiException(400, "expected a JSON array", "INVALID_BODY")
    val it = n.asInstanceOf[ArrayNode].elements()
    val out = Seq.newBuilder[JsonNode]
    while (it.hasNext) out += it.next()
    out.result()
  }

  private def urlDecode(s: String): String =
    java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)

  private def splitQuery(raw: String): (String, Map[String, String]) =
    raw.split("\\?", 2) match {
      case Array(p) => (p, Map.empty)
      case Array(p, q) => (p, q.split("&").filter(_.contains("="))
        .map { kv =>
          val Array(k, v) = kv.split("=", 2)
          urlDecode(k) -> urlDecode(v)
        }.toMap)
    }
}

object RestApi {
  final case class ApiException(status: Int, message: String, code: String)
    extends RuntimeException(message)
}
