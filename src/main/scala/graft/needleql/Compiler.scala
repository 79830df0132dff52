package graft.needleql

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Ast._
import graft.filter.{Filter, FilterOp, JValue, JNull, JNum, JStr, JBool, JArr}
import graft.ops.{Mmr, SearchBuilder, TimeDecay}
import graft.text.{Bm25, Rrf}

/** NeedleQL session: catalog of named collections + parameter binding +
  * statement execution (SURVEY.md §2.9; reference pipeline:
  * src/search/query_lang/executor.rs and src/search/needleql_executor.rs).
  *
  * Every statement compiles to DataFrame operations — Catalyst replaces the
  * reference's CostBasedOptimizer (its strategies collapse on the exact
  * engine: filter-then-scan is always right, SURVEY.md §4.1). EXPLAIN
  * returns the NeedleQL-level plan narrative plus Spark's physical plan.
  */
final case class CollectionDef(
    df: DataFrame,
    idCol: String = "id",
    vectorCol: String = "vector",
    metric: String = "cosine",
    insertedAtCol: Option[String] = None,
    textCol: Option[String] = None)

object CollectionDef {
  /** Py4J/Java-friendly constructors (no default args or Option over the
    * gateway) — the PySpark bindings recipe (examples/pyspark_recipe.py)
    * calls these.
    */
  def of(df: DataFrame): CollectionDef = CollectionDef(df)
  def of(df: DataFrame, idCol: String, vectorCol: String,
         metric: String): CollectionDef =
    CollectionDef(df, idCol, vectorCol, metric)
  def of(df: DataFrame, idCol: String, vectorCol: String, metric: String,
         textCol: String): CollectionDef =
    CollectionDef(df, idCol, vectorCol, metric, None, Option(textCol))
}

class NeedleSession(val spark: SparkSession) {

  val collections: mutable.LinkedHashMap[String, CollectionDef] = mutable.LinkedHashMap()
  /** Views (reference: needleql_executor.rs CreateView/DropView +
    * src/services/collection/materialized_views.rs): a named stored query;
    * materialized views cache their result until refreshView(). */
  final case class ViewDef(query: Query, materialized: Boolean,
                           var cached: Option[DataFrame] = None,
                           var refreshedAtMs: Long = 0L)
  val views: mutable.LinkedHashMap[String, ViewDef] = mutable.LinkedHashMap()
  var params: Map[String, Any] = Map.empty
  /** Pluggable cross-encoder scorers for RERANK BY CrossEncoder('model'):
    * (queryText, docText) => relevance. The reference calls an external
    * rerank API (reranker.rs:170-360) and falls back to term-overlap when
    * no provider is configured — unregistered models here do the same
    * ([[graft.ops.TermOverlap]] is the deterministic local fallback).
    */
  val crossEncoders: mutable.Map[String, (String, String) => Double] =
    mutable.Map()
  def registerCrossEncoder(model: String,
                           scorer: (String, String) => Double): this.type = {
    crossEncoders(model) = scorer; this
  }
  /** Deterministic clock for time decay (None = wall clock). */
  var nowEpochS: Option[Long] = None
  /** Round distances to N decimals for reproducible comparisons. */
  var roundDistanceTo: Option[Int] = None

  /** Per-collection state history: entry v-1 is the state at version v
    * (1-based; registration is version 1). Backs AS OF VERSION — the
    * DataFrame snapshots are lazy plans, so retention is cheap.
    */
  val history: mutable.LinkedHashMap[String, mutable.ArrayBuffer[CollectionDef]] =
    mutable.LinkedHashMap()

  private def commit(name: String, d: CollectionDef): Unit = {
    collections(name) = d
    history.getOrElseUpdate(name, mutable.ArrayBuffer()) += d
    evictBm25(name, keepVersion = -1) // superseded indexes: unpersist now
  }

  def register(name: String, d: CollectionDef): this.type = {
    commit(name, d); this
  }

  // ---------------------------------------------------------- snapshots
  // Named snapshots stored as __snapshot__{coll}__{name} entries, exactly
  // the reference's keying (database/snapshots.rs:10-56). DataFrames are
  // immutable plans, so the registered def IS a full point-in-time capture.

  private def snapshotKey(coll: String, name: String) =
    s"__snapshot__${coll}__${name}"

  def createSnapshot(coll: String, name: String): Unit =
    collections(snapshotKey(coll, name)) = resolve(coll)

  def restoreSnapshot(coll: String, name: String): Unit =
    commit(coll, collections.getOrElse(snapshotKey(coll, name),
      throw Parser.ParseError(s"Snapshot '$name' not found for collection '$coll'")))

  def listSnapshots(coll: String): Seq[String] = {
    val prefix = s"__snapshot__${coll}__"
    collections.keys.filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix)).toSeq
  }

  def deleteSnapshot(coll: String, name: String): Boolean =
    collections.remove(snapshotKey(coll, name)).isDefined

  // ------------------------------------------------------------ aliases
  // Collection aliases (reference: database/aliases.rs): name indirection
  // resolved at QUERY time, so update_alias atomically repoints readers —
  // the blue/green reindex pattern (aliases.rs:10-35 docs). Creation
  // rejects a name already taken by an alias or a collection (:37-61);
  // update requires both the alias and the target to exist (:222-241).

  val aliases: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap()

  private def requireCollection(name: String): Unit =
    if (!collections.contains(name))
      throw Parser.ParseError(s"Collection not found: $name")

  def createAlias(alias: String, collection: String): this.type = {
    requireCollection(collection)
    if (aliases.contains(alias) || collections.contains(alias))
      throw Parser.ParseError(s"Alias already exists: $alias")
    aliases(alias) = collection; this
  }

  def deleteAlias(alias: String): Boolean = aliases.remove(alias).isDefined

  def updateAlias(alias: String, collection: String): this.type = {
    requireCollection(collection)
    if (!aliases.contains(alias))
      throw Parser.ParseError(s"Alias not found: $alias")
    aliases(alias) = collection; this
  }

  def listAliases: Seq[(String, String)] = aliases.toSeq

  def canonicalName(alias: String): Option[String] = aliases.get(alias)

  def aliasesForCollection(collection: String): Seq[String] =
    aliases.collect { case (a, c) if c == collection => a }.toSeq

  /** Writes through an alias land on the canonical collection. */
  private def canonical(name: String): String =
    if (collections.contains(name)) name else aliases.getOrElse(name, name)
  def bind(name: String, value: Any): this.type = {
    params += name -> value; this
  }

  def sql(query: String): DataFrame = execute(Parser.parse(query))

  def execute(stmt: Statement): DataFrame = stmt match {
    case SelectStmt(q)        => compileQuery(q)
    case ExplainStmt(q, _)    => explain(q)
    case ShowCollectionsStmt  =>
      import spark.implicits._
      collections.keys.filterNot(_.startsWith("__snapshot__"))
        .toSeq.toDF("collection")
    case CreateCollectionStmt(name, opts) =>
      val dims = opts.get("dimensions").map(_.toInt).getOrElse(0)
      val metric = opts.getOrElse("distance", "cosine")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("vector",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        org.apache.spark.sql.types.StructField("metadata",
          org.apache.spark.sql.types.StringType)))
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      commit(name, CollectionDef(empty, metric = metric))
      status(s"created collection $name (dims=$dims, distance=$metric)")
    case DropCollectionStmt(name) =>
      collections.remove(name)
      status(s"dropped collection $name")
    case InsertStmt(coll, id, vec, meta) =>
      val c = resolve(coll)
      import spark.implicits._
      val row = Seq((id, vec.toArray, meta.orNull))
        .toDF(c.idCol, c.vectorCol, "metadata")
      commit(canonical(coll), c.copy(df = c.df.unionByName(row,
        allowMissingColumns = true)))
      status(s"inserted 1 row into $coll")
    case CreateViewStmt(name, materialized, q) =>
      val v = ViewDef(q, materialized)
      if (materialized) refreshInto(v)
      views(name) = v
      status(s"created ${if (materialized) "materialized " else ""}view $name")
    case DropViewStmt(name) =>
      views.remove(name)
      status(s"dropped view $name")
    case DeleteStmt(coll, where) =>
      val c = resolve(coll)
      val remaining = where match {
        case Some(e) =>
          val pred = graft.filter.FilterCompiler.compile(toFilter(e), c.df)
          c.df.filter(!coalesce(pred, lit(false)))
        case None => c.df.limit(0)
      }
      commit(canonical(coll), c.copy(df = remaining))
      status(s"deleted from $coll")
  }

  private def status(msg: String): DataFrame = {
    import spark.implicits._
    Seq(msg).toDF("status")
  }

  private def resolve(name: String): CollectionDef =
    collections.get(name)
      .orElse(aliases.get(name).flatMap(collections.get))
      .getOrElse(throw Parser.ParseError(s"Collection not found: $name"))

  // ------------------------------------------------------------- SELECT

  private def refreshInto(v: ViewDef): Unit = {
    v.cached = Some(compileQuery(v.query).localCheckpoint(true))
    v.refreshedAtMs = System.currentTimeMillis()
  }

  /** Re-materialize a view (staleness-driven refresh job). */
  def refreshView(name: String): Unit =
    views.get(name).filter(_.materialized).foreach(refreshInto)

  /** Staleness-triggered refresh (reference: materialized_views.rs:40-60 —
    * staleness/drift drives recompute): refresh only when the cached copy
    * is older than `maxAgeMs`. Returns true when a refresh ran.
    */
  def refreshViewIfStale(name: String, maxAgeMs: Long,
                         nowMs: Long = System.currentTimeMillis()): Boolean =
    views.get(name).filter(_.materialized)
      .filter(v => nowMs - v.refreshedAtMs > maxAgeMs)
      .map { v => refreshInto(v); true }.getOrElse(false)

  def compileQuery(q: Query): DataFrame = {
    // FROM may name a view: materialized -> cached snapshot; plain -> its
    // stored query's result becomes this query's scan
    val c = views.get(q.from) match {
      case Some(v) =>
        val base = v.cached.getOrElse(compileQuery(v.query))
        CollectionDef(base, idCol = base.columns.head, vectorCol = "none")
      case None => resolve(q.from)
    }
    compileQueryOn(c, q)
  }

  private def compileQueryOn(c0: CollectionDef, q: Query): DataFrame = {
    val limit = q.limit.getOrElse(10L).toInt // reference default 10

    // AS OF: SNAPSHOT/VERSION swap the scanned state; TIMESTAMP or a time
    // expression becomes an inserted_at upper bound (reference:
    // needleql_executor.rs:124-134 + persistence/time_travel.rs)
    def snapDef(name: String): CollectionDef =
      collections.getOrElse(snapshotKey(q.from, name),
        throw Parser.ParseError(
          s"Snapshot '$name' not found for collection '${q.from}'"))
    val (c, asOfTs): (CollectionDef, Option[Long]) = q.asOf match {
      case None                    => (c0, None)
      case Some(AsOfTimestamp(ts)) => (c0, Some(ts))
      case Some(AsOfVersion(v)) =>
        val h = history.getOrElse(q.from,
          throw Parser.ParseError(s"No version history for ${q.from}"))
        if (v < 1 || v > h.size) throw Parser.ParseError(
          s"Version $v out of range for ${q.from} (1..${h.size})")
        (h((v - 1).toInt), None)
      case Some(AsOfSnapshot(n)) => (snapDef(n), None)
      case Some(AsOfExpr(e)) => TimeExpr.parse(e) match {
        case TimeExpr.AtSnapshot(n) => (snapDef(n), None)
        case parsed =>
          val now = nowEpochS.getOrElse(System.currentTimeMillis() / 1000)
          (c0, Some(TimeExpr.resolve(parsed, now)))
      }
    }

    // Query vector: NEAREST_TO literal or SIMILAR TO $param
    val similarParam = q.where.flatMap(findSimilar)
    val queryVec: Option[Column] = q.nearestTo.map(n => lit(n.vector.toArray))
      .orElse(similarParam.map { p =>
        params.get(p) match {
          case Some(v: Array[Float]) => lit(v)
          case Some(v: Seq[_]) => lit(v.map(_.toString.toFloat).toArray)
          case _ => throw Parser.ParseError(s"Missing vector parameter $$$p")
        }
      })
    val metric = q.nearestTo.flatMap(_.distanceFn).getOrElse(c.metric)
    val preFilter = q.where.map(toFilter).filterNot(isTrivial)

    // USING RAG options: hybrid_alpha overrides the fusion weight, top_k
    // widens retrieval (reference: needleql_executor.rs:735-746)
    val hybridCfg = q.hybrid.map { h =>
      q.rag.flatMap(_.hybridAlpha).fold(h)(a => h.copy(vectorWeight = a))
    }
    val fetchLimit = math.max(limit, q.rag.flatMap(_.topK).getOrElse(limit))
    // RERANK ... FETCH n: the search over-fetches n candidates for the
    // reranker, which then cuts back to LIMIT (reference ast.rs:222 —
    // fetch_k widens retrieval, not the final result)
    val rerankFetch = q.rerank.flatMap(_.fetchK).map(f => math.max(f, limit))
    val searchK = rerankFetch.getOrElse(limit)

    val result: DataFrame = (queryVec, hybridCfg) match {
      case (_, Some(h)) =>
        hybridSearch(c, h, q, math.max(fetchLimit, searchK)).limit(searchK)
      case (Some(qv), _) =>
        val builder = SearchBuilder(
          df = c.df, query = qv, vecCol = col(c.vectorCol),
          idCol = col(c.idCol), k = searchK, // offset skips AFTER search (executor.rs:193-197)
          metric = metric, preFilter = preFilter,
          asOf = asOfTs,
          decay = q.timeDecay.map(toDecay),
          insertedAtCol = c.insertedAtCol.map(col),
          nowEpochS = nowEpochS,
          roundDistanceTo = roundDistanceTo,
          includeCols = c.df.columns.filterNot(_ == c.idCol).toSeq)
        builder.execute()
      case (None, None) =>
        val base = preFilter.fold(c.df)(f =>
          c.df.filter(graft.filter.FilterCompiler.compile(f, c.df)))
        val asOfd = (asOfTs, c.insertedAtCol) match {
          case (Some(ts), Some(ins)) => base.filter(col(ins).isNull || col(ins) <= ts)
          case _ => base
        }
        asOfd
    }

    val reranked0 = applyRerank(result, q, c, queryVec)
    // over-fetched rerank pools cut back to the requested LIMIT
    val reranked =
      if (rerankFetch.exists(_ > limit)) reranked0.limit(limit) else reranked0
    val ordered =
      if (q.orderBy.nonEmpty)
        reranked.orderBy(q.orderBy.map { case (cn, asc) =>
          if (asc) col(cn).asc else col(cn).desc
        }: _*)
      else reranked
    val limited =
      if (queryVec.isEmpty && q.hybrid.isEmpty) ordered.limit(limit + q.offset.getOrElse(0L).toInt)
      else ordered
    // OFFSET applied post-search (reference: executor.rs:193-197)
    val offsetted = q.offset.fold(limited)(o => limited.offset(o.toInt))
    project(applyRagOptions(offsetted, q, c), q.select)
  }

  /** USING RAG(rerank=..., deduplicate=...) post-retrieval stages. The
    * reference PARSES both options but its executor applies only top_k and
    * hybrid_alpha (needleql_executor.rs:735-746) — the dedup machinery
    * lives in its ingestion pipeline (pipeline.rs:855 deduplicate_chunks,
    * threshold 0.9 greedy keep-first). A silently-accepted clause is a
    * user trap, so here both are honored over the k-bounded retrieved set:
    * rerank=true re-scores with TermOverlap against the hybrid text;
    * deduplicate=true drops near-duplicate texts (word-3-gram Jaccard ≥
    * 0.9, first occurrence wins — the deduplicate_chunks rule).
    */
  private def applyRagOptions(df: DataFrame, q: Query,
                              c: CollectionDef): DataFrame =
    q.rag.fold(df) { r =>
      def textColName = c.textCol.getOrElse(throw Parser.ParseError(
        s"Collection ${q.from} has no text column for USING RAG post-processing"))
      def withText(d: DataFrame) =
        if (d.columns.contains(textColName)) d
        else d.join(c.df.select(col(c.idCol), col(textColName)), c.idCol)
      var d = df
      if (r.rerank.contains(true)) {
        val queryText = q.hybrid.map(_.text).getOrElse(throw Parser.ParseError(
          "USING RAG(rerank=true) requires a text query (HYBRID_SEARCH)"))
        val scores = graft.ops.TermOverlap
          .rerank(withText(d), queryText, c.idCol, textColName, topK = Int.MaxValue)
          .withColumnRenamed("score", "rag_rerank_score")
          .withColumnRenamed("id", c.idCol)
        d = d.join(scores, c.idCol)
          .orderBy(col("rag_rerank_score").desc, col(c.idCol).asc)
      }
      if (r.deduplicate.contains(true)) {
        // k-bounded retrieved set: greedy keep-first over collected texts
        val rows = withText(d)
          .select(col(c.idCol).cast("string"), col(textColName)).collect()
        def shingleSet(t: String): Set[String] = {
          val toks = (if (t == null) "" else t).trim.toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          if (toks.length < 3) Set(toks.mkString(" "))
          else toks.sliding(3).map(_.mkString(" ")).toSet
        }
        val keep = scala.collection.mutable.ArrayBuffer[(String, Set[String])]()
        rows.foreach { row =>
          val sh = shingleSet(row.getString(1))
          val dup = keep.exists { case (_, ksh) =>
            val inter = sh.intersect(ksh).size.toDouble
            val union = (sh.size + ksh.size - inter) max 1.0
            inter / union >= 0.9
          }
          if (!dup) keep += ((row.getString(0), sh))
        }
        val keepIds = keep.map(_._1).toSeq
        d = d.filter(col(c.idCol).cast("string").isin(keepIds: _*))
      }
      d
    }

  // BM25 stats per collection VERSION (the history index is a monotonic
  // version counter): a session keeps the index until a mutation commits a
  // new version, mirroring the reference's incrementally-maintained
  // Bm25Index (hybrid.rs:270-330). Keying on version — not df identity
  // hash — means a GC'd-and-reused identityHashCode can never serve a
  // stale index, and superseded entries are unpersisted on commit.
  private val bm25Cache = mutable.HashMap[(String, Int), Bm25.Index]()

  private[needleql] def evictBm25(name: String, keepVersion: Int): Unit =
    bm25Cache.keys.filter(k => k._1 == name && k._2 != keepVersion)
      .toSeq.foreach { k => bm25Cache.remove(k).foreach(_.unpersist()) }

  private def hybridSearch(c: CollectionDef, h: HybridSearch, q: Query,
                           limit: Int): DataFrame = {
    val textCol = c.textCol.getOrElse(
      throw Parser.ParseError(s"Collection ${q.from} has no text column for HYBRID_SEARCH"))
    // version of THIS state (AS OF can resolve historical defs); a def not
    // in the history (e.g. a snapshot view) is built uncached.
    val version = history.get(q.from).map(_.lastIndexWhere(_ eq c)).getOrElse(-1)
    def build() = Bm25.index(c.df, col(c.idCol), col(textCol)).persisted()
    val ix =
      if (version < 0) build()
      else bm25Cache.getOrElseUpdate((q.from, version), build())
    val bmTop = Bm25.search(ix, h.text, limit * 5)
      .withColumnRenamed("doc_id", "id")
    val vecTop = h.vector match {
      case Some(v) =>
        graft.ops.Search.topK(c.df, col(c.vectorCol), lit(v.toArray),
          limit * 5, c.metric, c.idCol)
          .select(col(c.idCol).as("id"), col("distance"))
      case None => // text-only: empty vector leg
        import spark.implicits._
        Seq.empty[(String, Double)].toDF("id", "distance")
    }
    Rrf.fuse(vecTop, bmTop,
      Rrf.Config(k = h.rrfK, vectorWeight = h.vectorWeight,
        bm25Weight = 1.0 - h.vectorWeight),
      limit)
  }

  private def applyRerank(df: DataFrame, q: Query, c: CollectionDef,
                          queryVec: Option[Column]): DataFrame =
    q.rerank.map(_.strategy) match {
      case Some(RerankStrategy.Field(colName, asc)) =>
        // id tiebreak: a bare field sort is nondeterministic on duplicate
        // values, and with FETCH n the final LIMIT depends on this order
        df.orderBy(
          if (asc) col(colName).asc else col(colName).desc,
          col(c.idCol).asc)
      case Some(RerankStrategy.Mmr(lambda)) =>
        // MMR needs the vectors: join them back, collect bounded pool
        val k = q.limit.getOrElse(10L).toInt
        // the search result usually already carries the vector; only join
        // it back when a projection dropped it (join would be ambiguous)
        val pool =
          if (df.columns.contains(c.vectorCol)) df
          else df.join(c.df.select(col(c.idCol), col(c.vectorCol)), c.idCol)
        // Query's own NEAREST_TO literal wins; otherwise the SIMILAR TO
        // parameter looked up BY NAME (never an arbitrary bound Float array —
        // params map order is not meaningful).
        val qArr = q.nearestTo.map(_.vector.toArray)
          .orElse(q.where.flatMap(findSimilar).flatMap(p =>
            params.get(p).collect { case a: Array[Float] => a }))
          .getOrElse(
            throw Parser.ParseError("MMR rerank requires a query vector"))
        Mmr.diversify(pool, c.idCol, c.vectorCol, qArr, k, lambda)
      case Some(RerankStrategy.CrossEncoder(model)) =>
        // pluggable (query, text) => score; unregistered models fall back
        // to the deterministic TermOverlap scorer — the reference's own
        // behavior when no rerank provider is configured (reranker.rs:192)
        val textColName = c.textCol.getOrElse(throw Parser.ParseError(
          s"Collection ${q.from} has no text column for CrossEncoder rerank"))
        val queryText = q.hybrid.map(_.text).getOrElse(throw Parser.ParseError(
          "CrossEncoder rerank requires a text query (HYBRID_SEARCH / SEARCH NEAR)"))
        val pool =
          if (df.columns.contains(textColName)) df
          else df.join(c.df.select(col(c.idCol), col(textColName)), c.idCol)
        crossEncoders.get(model) match {
          case Some(scorer) =>
            val scoreU = udf((t: String) =>
              scorer(queryText, if (t == null) "" else t))
            pool.withColumn("ce_score", scoreU(col(textColName)))
              .orderBy(col("ce_score").desc, col(c.idCol).asc)
          case None =>
            val scores = graft.ops.TermOverlap
              .rerank(pool, queryText, c.idCol, textColName, topK = Int.MaxValue)
              .withColumnRenamed("score", "ce_score")
              .withColumnRenamed("id", c.idCol)
            pool.join(scores, c.idCol)
              .orderBy(col("ce_score").desc, col(c.idCol).asc)
        }
      case Some(RerankStrategy.Rrf(_)) | None =>
        df // RRF rerank is the fusion already applied in hybridSearch
    }

  private def project(df: DataFrame, sel: SelectClause): DataFrame = sel match {
    case SelectAll       => df
    case SelectCols(cols) => df.select(cols.map(col): _*)
  }

  // ---------------------------------------------------------- translation

  private def findSimilar(e: Expression): Option[String] = e match {
    case SimilarTo(_, p) => Some(p)
    case AndExpr(l, r)   => findSimilar(l).orElse(findSimilar(r))
    case OrExpr(l, r)    => findSimilar(l).orElse(findSimilar(r))
    case NotExpr(inner)  => findSimilar(inner)
    case _               => None
  }

  private def isTrivial(f: Filter): Boolean = f match {
    case Filter.And(fs) => fs.forall(isTrivial)
    case _              => false
  }

  private def literalToJ(l: Literal): JValue = l match {
    case StrLit(s)      => JStr(s)
    case NumLit(d)      => JNum(d)
    case BoolLit(b)     => JBool(b)
    case NullLit        => JNull
    case DurationLit(s) => JNum(s.toDouble)
    case ParamRef(p) => params.get(p) match {
      case Some(s: String)  => JStr(s)
      case Some(n: Number)  => JNum(n.doubleValue())
      case Some(b: Boolean) => JBool(b)
      case other => throw Parser.ParseError(s"Unbound or non-scalar parameter $$$p ($other)")
    }
  }

  /** Expression → Filter ADT, mirroring executor.rs:222-309: LIKE compiles
    * to `$contains` after trimming '%'; IS NULL to Eq null; SIMILAR TO to
    * the match-all placeholder.
    */
  def toFilter(e: Expression): Filter = e match {
    case SimilarTo(_, _) => Filter.And(Nil) // pass-through
    case Comparison(c, op, v) =>
      val fop = op match {
        case "="  => FilterOp.Eq
        case "!=" => FilterOp.Ne
        case "<"  => FilterOp.Lt
        case "<=" => FilterOp.Lte
        case ">"  => FilterOp.Gt
        case ">=" => FilterOp.Gte
      }
      Filter.Condition(c, fop, literalToJ(v))
    case InList(c, vs, neg) =>
      val f = Filter.Condition(c, FilterOp.In, JArr(vs.map(literalToJ).toVector))
      if (neg) Filter.Not(f) else f
    case BetweenExpr(c, lo, hi, neg) =>
      val f = Filter.And(Seq(
        Filter.Condition(c, FilterOp.Gte, literalToJ(lo)),
        Filter.Condition(c, FilterOp.Lte, literalToJ(hi))))
      if (neg) Filter.Not(f) else f
    case LikeExpr(c, pattern, neg) =>
      val f = Filter.Condition(c, FilterOp.Contains,
        JStr(pattern.replaceAll("^%+|%+$", "")))
      if (neg) Filter.Not(f) else f
    case IsNullExpr(c, neg) =>
      val f = Filter.Condition(c, FilterOp.Eq, JNull)
      if (neg) Filter.Not(f) else f
    case AndExpr(l, r) => Filter.And(Seq(toFilter(l), toFilter(r)))
    case OrExpr(l, r)  => Filter.Or(Seq(toFilter(l), toFilter(r)))
    case NotExpr(x)    => Filter.Not(toFilter(x))
  }

  private def toDecay(t: TimeDecayClause): TimeDecay = {
    def p(names: String*): Long = names.flatMap(t.params.get).headOption
      .map(_.toLong).getOrElse(
        throw Parser.ParseError(s"TIME_DECAY(${t.function}) missing param (${names.mkString("/")})"))
    t.function match {
      case "exponential" => TimeDecay.Exponential(p("half_life", "half_life_seconds"))
      case "linear"      => TimeDecay.Linear(p("max_age", "max_age_seconds"))
      case "step"        => TimeDecay.Step(p("window", "window_seconds"))
      case "gaussian"    => TimeDecay.Gaussian(p("sigma", "sigma_seconds"))
    }
  }

  // --------------------------------------------------------------- EXPLAIN

  /** Plan narrative (reference plan steps: needleql_executor.rs:296-320) +
    * Spark physical plan.
    */
  def explain(q: Query): DataFrame = {
    import spark.implicits._
    val steps = Seq.newBuilder[String]
    if (q.asOf.isDefined) steps += s"TimeTravelScan(as_of=${q.asOf.get})"
    else steps += s"Scan(${q.from})"
    if (q.nearestTo.isDefined || q.where.exists(findSimilar(_).isDefined))
      steps += "VectorSearch(exact top-k via TakeOrderedAndProject)"
    if (q.hybrid.isDefined) steps += "TextSearch(BM25) + HybridFusion(RRF)"
    if (q.where.exists(w => !isTrivial(toFilter(w))))
      steps += "MetadataFilter(pushed to scan)"
    if (q.timeDecay.isDefined) steps += s"TimeDecay(${q.timeDecay.get.function})"
    if (q.rerank.isDefined) steps += s"Rerank(${q.rerank.get.strategy})"
    if (q.orderBy.nonEmpty) steps += s"Sort(${q.orderBy.mkString(",")})"
    steps += s"Limit(${q.limit.getOrElse(10L)})"
    q.offset.foreach(o => steps += s"Offset($o)")
    val narrative = steps.result()
    val physical = compileQuery(q.copy(explain = false))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    (narrative.zipWithIndex.map { case (s, i) => (i, "plan", s) } :+
      ((narrative.size, "spark", physical)))
      .toDF("step", "kind", "detail")
  }
}
