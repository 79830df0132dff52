package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.needleql.{CollectionDef, NeedleSession}

/** Oracle gates for the language/session surfaces that were previously
  * ScalaTest-only (SURVEY §2.9 layer 2 + §2.11 superset + §2.1 bundles):
  * NEAREST_TO through the parser, AS OF version time-travel, collection
  * aliases, materialized views, batch semantics of the watermarked
  * tumbling-window aggregation, and the bundle export/import round-trip.
  * Each runs the REAL surface (parse → compile → execute, or
  * filesystem round-trip) and the oracle recomputes the result
  * relationally — gating the plumbing, not just the operator underneath.
  */
object LanguageSurfaceQueries {

  private def session(s: SparkSession, dir: String): NeedleSession = {
    val ns = new NeedleSession(s)
    ns.register("documents", CollectionDef(
      Tables.load(s, dir, "documents"), idCol = "doc_id", vectorCol = "none",
      textCol = Some("text")))
    val emb = Tables.load(s, dir, "embeddings")
    ns.register("embeddings", CollectionDef(
      emb, idCol = "vec_id", vectorCol = "embedding", metric = "cosine"))
    ns.roundDistanceTo = Some(6)
    ns
  }

  val defs: Map[String, Q] = Map(
    // NEAREST_TO(literal, 'euclidean') through lexer → parser → compiler:
    // the query vector is vec_id 0's embedding rendered as a vector
    // literal (Float.toString round-trips exactly through the parser).
    "needleql_nearest" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(list_distance(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |FROM embeddings, q
        |ORDER BY distance, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val q = Tables.load(s, dir, "embeddings").filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0)
        // plain decimal, not Float.toString: tiny components render in
        // scientific notation ("1.2E-5") which is not grammar; the exact
        // decimal expansion parses back to the identical float
        .map(f => new java.math.BigDecimal(f.toDouble).toPlainString)
      session(s, dir).sql(
        s"SELECT vec_id, distance FROM embeddings " +
          s"NEAREST_TO([${q.mkString(", ")}], 'euclidean') LIMIT 10")
    },

    // AS OF VERSION time-travel: version 1 registers doc_id < 30, a
    // re-register commits version 2 with doc_id < 40; the language reads
    // the superseded state.
    "needleql_asof" -> Q(
      """SELECT doc_id, source FROM documents WHERE doc_id < 30
        |ORDER BY doc_id LIMIT 100""".stripMargin
    ) { (s, dir) =>
      val ns = session(s, dir)
      val d = Tables.load(s, dir, "documents")
      ns.register("docs", CollectionDef(d.filter(col("doc_id") < 30),
        idCol = "doc_id", vectorCol = "none", textCol = Some("text")))
      ns.register("docs", CollectionDef(d.filter(col("doc_id") < 40),
        idCol = "doc_id", vectorCol = "none", textCol = Some("text")))
      ns.sql("SELECT doc_id, source FROM docs AS OF VERSION 1 " +
        "ORDER BY doc_id LIMIT 100")
    },

    // Collection alias (reference database/aliases.rs): blue/green name
    // indirection resolved at query time.
    "alias_query" -> Q(
      """SELECT doc_id, source FROM documents WHERE doc_id < 50
        |ORDER BY doc_id LIMIT 100""".stripMargin
    ) { (s, dir) =>
      val ns = session(s, dir)
      ns.createAlias("docs_live", "documents")
      ns.sql("SELECT doc_id, source FROM docs_live WHERE doc_id < 50 " +
        "ORDER BY doc_id LIMIT 100")
    },

    // Materialized view: defined over a NARROW base state (doc_id < 120),
    // then the base is re-registered at full width and refreshView pulls
    // the new state into the snapshot — so the rows ≥ 120 in the result
    // exist ONLY if the refresh actually re-materialized (reference
    // materialized_views.rs staleness-driven recompute). r19 audit: the
    // first fixture refreshed a base that never changed, so CREATE's own
    // materialization made refreshView dead code and its mutation was
    // gate-invisible.
    "needleql_view" -> Q(
      """SELECT doc_id, source FROM documents WHERE doc_id BETWEEN 100 AND 160
        |ORDER BY doc_id LIMIT 100""".stripMargin
    ) { (s, dir) =>
      val ns = session(s, dir)
      val d = Tables.load(s, dir, "documents")
      ns.register("docsrc", CollectionDef(d.filter(col("doc_id") < 120),
        idCol = "doc_id", vectorCol = "none", textCol = Some("text")))
      // the language's default LIMIT is 10 (reference default k), so the
      // view definition carries its own LIMIT covering the full range
      ns.sql("CREATE MATERIALIZED VIEW recent AS " +
        "SELECT doc_id, source FROM docsrc WHERE doc_id BETWEEN 100 AND 160 " +
        "ORDER BY doc_id LIMIT 100")
      // base widens AFTER create; the stale snapshot holds only 100-119
      ns.register("docsrc", CollectionDef(d, idCol = "doc_id",
        vectorCol = "none", textCol = Some("text")))
      ns.refreshView("recent")
      ns.sql("SELECT doc_id, source FROM recent ORDER BY doc_id LIMIT 100")
    },

    // Batch semantics of the §2.11 watermarked tumbling-window aggregation
    // (streaming/Streams.windowedCounts is the same groupBy(window(...))
    // plan): hourly event counts per type, window bounds as epoch seconds.
    "windowed_agg" -> Q(
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
        |       CAST(epoch(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour') AS BIGINT) AS window_end,
        |       event_type, count(*) AS n
        |FROM events
        |GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin
    ) { (s, dir) =>
      // events.ts has drifted across testdata generations: TIMESTAMP(NANOS)
      // parquet arrives as raw long nanos (legacy conf in Tables.load),
      // TIMESTAMP(MICROS) as a native (NTZ) timestamp. Branch on the actual
      // dtype so either generation feeds the same windowed plan.
      val raw = Tables.load(s, dir, "events")
      val ev = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
      graft.streaming.Streams.windowedCounts(
          ev, "ts", "event_type",
          windowDur = "1 hour", lateness = "10 minutes")
        .select(unix_timestamp(col("window_start")).as("window_start"),
          unix_timestamp(col("window_end")).as("window_end"),
          col("event_type"), col("n"))
        .orderBy(col("window_start"), col("event_type"))
    },

    // Pipeline DSL under the driver gate (reference search_pipeline.rs:
    // 106-448): a JSON pipeline string → fromJson → optimize() (filters
    // re-ordered after search) → execute; the oracle replays the
    // optimized stage order relationally. Gates the JSON parse, the
    // rewrite, and the stage compilation — not just the operators.
    "pipeline_dsl" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |top AS (
        |  SELECT vec_id, label,
        |         round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |  FROM embeddings, q
        |  ORDER BY distance, vec_id LIMIT 30)
        |SELECT vec_id, CAST(label AS BIGINT) AS label, distance
        |FROM top WHERE label < 5 AND distance <= 0.8
        |ORDER BY distance, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      import graft.ops.PipelineDsl.SearchPipeline
      val json =
        """{"name":"gate","version":"1","stages":[
          |  {"type":"filter","filter":"{\"label\": {\"$lt\": 5}}"},
          |  {"type":"search","k":30},
          |  {"type":"threshold","max_distance":0.8},
          |  {"type":"limit","k":10}]}""".stripMargin
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      // optimize() re-orders to search -> filter -> threshold -> limit
      SearchPipeline.fromJson(json).optimize()
        .execute(emb, col("embedding"), "vec_id", q, roundTo = Some(6))
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("distance"))
        .orderBy(col("distance"), col("vec_id"))
    },

    // Bundle export/import round-trip (reference bundle format:
    // config.json + data parquet): write a collection bundle, read it
    // back, and surface both the rows and the parsed config fields.
    "bundle_roundtrip" -> Q(
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dims, label,
        |       'emb-bundle' AS bundle_name, CAST(64 AS BIGINT) AS bundle_dims,
        |       CAST(100 AS BIGINT) AS bundle_count
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin
    ) { (s, dir) =>
      import graft.sources.Interchange
      val out = java.nio.file.Files
        .createTempDirectory("graft_bundle").toString
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id"), col("embedding"), col("label"))
      Interchange.exportBundle(emb, out, name = "emb-bundle", dims = 64,
        distance = "cosine")
      val (df, cfg) = Interchange.importBundle(s, out)
      df.select(col("vec_id"), size(col("embedding")).cast("long").as("dims"),
          col("label"),
          lit(cfg.name).as("bundle_name"),
          lit(cfg.dimensions).cast("long").as("bundle_dims"),
          lit(cfg.count).cast("long").as("bundle_count"))
        .orderBy(col("vec_id"))
    },
  )
}
