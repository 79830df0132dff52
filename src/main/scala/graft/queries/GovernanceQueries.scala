package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Rbac, TypedSchema}
import graft.ops.Rbac.{AccessToken, PolicyRule, RbacPolicy}
import graft.ops.Rbac.Permission.Read
import graft.ops.TypedSchema.{FieldDef, SchemaDefinition}
import graft.ops.TypedSchema.FieldType.{IntT, Str}

/** Oracle gates for the governance services (reference:
  * src/services/collection/{collection_rbac,typed_schema}.rs): the
  * RBAC compiled read predicate + field pruning, schema validation over
  * planted defects, default filling, and the secondary-index stats.
  */
object GovernanceQueries {

  val defs: Map[String, Q] = Map(
    // RBAC read: token holds reader (lang='en', sees lang only) AND
    // curator (source='src2', sees lang+source) → rows (lang='en' OR
    // source='src2'), columns pruned to the union of visible fields.
    "rbac_read" -> Q(
      """SELECT doc_id, lang, source FROM documents
        |WHERE lang = 'en' OR source = 'src2'
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val e = new Rbac.PolicyEngine(() => 100L)
      e.addPolicy(RbacPolicy("documents")
        .addRule(PolicyRule("reader").allow(Read)
          .withRowFilter("lang", "en").withVisibleFields(Seq("lang")))
        .addRule(PolicyRule("curator").allow(Read)
          .withRowFilter("source", "src2")
          .withVisibleFields(Seq("lang", "source"))))
      e.secureRead(
          Tables.load(s, dir, "documents")
            .select("doc_id", "lang", "source", "n_chars"),
          "documents", AccessToken("u", Seq("reader", "curator")),
          metadataCols = Seq("lang", "source", "n_chars"))
        .orderBy(col("doc_id"))
    },

    // Schema validation over planted defects: docs constructed with
    // doc_id%5 = 0 → required "n" omitted, = 1 → "n" typed as string,
    // = 2 → extra "x" under strict mode; the validator must recover
    // exactly the planted (id, field, kind) set.
    "schema_validate" -> Q(
      """SELECT doc_id AS id,
        |       CASE doc_id % 5 WHEN 0 THEN 'n' WHEN 1 THEN 'n'
        |            ELSE 'x' END AS field,
        |       CASE doc_id % 5 WHEN 0 THEN 'missing_required'
        |            WHEN 1 THEN 'type_mismatch'
        |            ELSE 'unknown_field' END AS kind
        |FROM documents WHERE doc_id < 300 AND doc_id % 5 IN (0, 1, 2)
        |ORDER BY id""".stripMargin
    ) { (s, dir) =>
      val schema = SchemaDefinition("documents")
        .field("lang", Str, required = true)
        .field("n", IntT, required = true)
        .strict
      val meta = concat(lit("{\"lang\":\""), col("lang"), lit("\""),
        when(col("doc_id") % 5 === 0, lit(""))
          .when(col("doc_id") % 5 === 1,
            concat(lit(",\"n\":\""), col("n_chars"), lit("\"")))
          .otherwise(concat(lit(",\"n\":"), col("n_chars"))),
        when(col("doc_id") % 5 === 2, lit(",\"x\":1")).otherwise(lit("")),
        lit("}"))
      TypedSchema.validate(
          Tables.load(s, dir, "documents").filter(col("doc_id") < 300)
            .withColumn("__meta", meta),
          col("doc_id"), col("__meta"), schema)
        .orderBy(col("id"))
    },

    // Default filling: quality (0.5) lands only on rows missing it.
    "schema_defaults" -> Q(
      """SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0
        |            THEN '{"lang":"' || lang || '","quality":0.9}'
        |            ELSE '{"lang":"' || lang || '","quality":0.5}'
        |       END AS meta
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val schema = SchemaDefinition("documents", fields = Vector(
        FieldDef("quality", TypedSchema.FieldType.FloatT,
          required = false, default = Some("0.5"))))
      val raw = when(col("doc_id") % 3 === 0,
          concat(lit("{\"lang\":\""), col("lang"),
            lit("\",\"quality\":0.9}")))
        .otherwise(concat(lit("{\"lang\":\""), col("lang"), lit("\"}")))
      Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TypedSchema.applyDefaults(schema, raw).as("meta"))
        .orderBy(col("doc_id"))
    },

    // Transactional commit (vector_transactions.rs): upsert + delete +
    // insert + update in ONE transaction over a documents-derived
    // collection; the oracle replays the committed end state. The
    // all-or-nothing swap is spec-pinned (TransactionsSpec); this gate
    // pins the applied-operation semantics. The vector column is reduced
    // to driver-safe scalars (dims + a position-weighted fixed-point
    // sum, element i × (i+1), so [1,2] and [2,1] fingerprint
    // differently): the harness's pandas sort cannot hash array cells,
    // and every element here is an integer-valued f32, so the
    // µ-precision weighted sum is exact. Vectors are 2-dim by
    // construction in this gate, so the weights are written out.
    "txn_commit" -> Q(
      """WITH base AS (
        |  SELECT CAST(doc_id AS VARCHAR) AS id,
        |         [CAST(n_chars AS FLOAT), CAST(doc_id % 7 AS FLOAT)] AS vector,
        |         source AS metadata
        |  FROM documents WHERE doc_id < 50
        |)
        |SELECT id, len(vector) AS dims,
        |       CAST(round((CAST(vector[1] AS DOUBLE)
        |                   + 2 * CAST(vector[2] AS DOUBLE)) * 1048576)
        |            AS BIGINT) AS vsum,
        |       metadata
        |FROM (
        |  SELECT id, vector, metadata FROM base
        |  WHERE id NOT IN ('5', '10', '20')
        |  UNION ALL SELECT '5', [CAST(1 AS FLOAT), CAST(2 AS FLOAT)], 'upserted'
        |  UNION ALL SELECT '20', [CAST(3 AS FLOAT), CAST(4 AS FLOAT)], 'updated'
        |  UNION ALL SELECT 'new1', [CAST(9 AS FLOAT), CAST(9 AS FLOAT)], NULL
        |) ORDER BY id""".stripMargin
    ) { (s, dir) =>
      import graft.ops.Transactions._
      import graft.ops.Transactions.TxOperation._
      val m = new TransactionManager(s, now = () => 1L)
      m.register("docs", Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id").cast("string").as("id"),
          array(col("n_chars").cast("float"),
            (col("doc_id") % 7).cast("float")).as("vector"),
          col("source").as("metadata")))
      val tx = m.begin()
      m.addOperation(tx, Upsert("docs", "5", Array(1f, 2f), Some("upserted")))
      m.addOperation(tx, Delete("docs", "10"))
      m.addOperation(tx, Insert("docs", "new1", Array(9f, 9f), None))
      m.addOperation(tx, Update("docs", "20", Array(3f, 4f), Some("updated")))
      m.commit(tx)
      m.collection("docs")
        .select(col("id"), size(col("vector")).as("dims"),
          expr("CAST(round((CAST(vector[0] AS DOUBLE) " +
            "+ 2 * CAST(vector[1] AS DOUBLE)) * 1048576) AS BIGINT)")
            .as("vsum"),
          col("metadata"))
        .orderBy(col("id"))
    },

    // PITR round-trip (pitr_service.rs): snapshot → destructive
    // mutation → recover-to-named; the recovered state must equal the
    // pre-mutation collection exactly (the oracle replays it). Like
    // txn_commit, the vector is fingerprinted to scalars (dims + the
    // position-weighted µ-fixed-point sum, element i × (i+1)) so the
    // harness never sees an array cell while permuted or compensated
    // element changes still alter the fingerprint; the elements are
    // integer-valued f32s, so the weighted sum is exact.
    "pitr_roundtrip" -> Q(
      """SELECT CAST(doc_id AS VARCHAR) AS id,
        |       len([CAST(n_chars AS FLOAT),
        |            CAST(doc_id % 5 AS FLOAT)]) AS dims,
        |       CAST(round((CAST(n_chars AS DOUBLE)
        |                   + 2 * CAST(doc_id % 5 AS DOUBLE)) * 1048576)
        |            AS BIGINT) AS vsum,
        |       lang AS metadata
        |FROM documents WHERE doc_id < 60 ORDER BY CAST(doc_id AS VARCHAR)"""
        .stripMargin
    ) { (s, dir) =>
      import graft.ops.Pitr._
      val registry = scala.collection.mutable.LinkedHashMap(
        "docs" -> Tables.load(s, dir, "documents")
          .filter(col("doc_id") < 60)
          .select(col("doc_id").cast("string").as("id"),
            array(col("n_chars").cast("float"),
              (col("doc_id") % 5).cast("float")).as("vector"),
            col("lang").as("metadata")))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-pitr-gate").toString
      val svc = new PitrService(s, PitrConfig(tmp),
        () => registry.keys.toSeq, registry(_), registry.update,
        now = () => 1L)
      svc.createSnapshot("before")
      registry("docs") = registry("docs").filter(col("id") === "0") // wreck it
      svc.recoverTo(RecoveryTarget.Named("before"))
      // wreck again and recover by TIMESTAMP, at exactly the snapshot's
      // timestampMs (now() is pinned to 1): the as-of filter is
      // `timestampMs <= ts` (pitr_service.rs as-of semantics) and this is
      // the only query that sits AT that boundary — the r18 audit found
      // the Named-only path left the `<=` unobservable (a `<` mutation
      // finds no restore point and must make this gate throw).
      registry("docs") = registry("docs").filter(col("id") === "0")
      svc.recoverTo(RecoveryTarget.Timestamp(1L))
      registry("docs")
        .select(col("id"), size(col("vector")).as("dims"),
          expr("CAST(round((CAST(vector[0] AS DOUBLE) " +
            "+ 2 * CAST(vector[1] AS DOUBLE)) * 1048576) AS BIGINT)")
            .as("vsum"),
          col("metadata"))
        .orderBy(col("id"))
    },

    // Secondary-index stats re-expressed: per-field entry + distinct
    // counts (the reference walks its HashMap indexes; one aggregation
    // per field here, unioned — both bounded by |fields|).
    "schema_index_stats" -> Q(
      """SELECT 'lang' AS field_name,
        |       CAST(count(lang) AS BIGINT) AS entry_count,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS distinct_values
        |FROM documents
        |UNION ALL
        |SELECT 'source', CAST(count(source) AS BIGINT),
        |       CAST(count(DISTINCT source) AS BIGINT) FROM documents
        |ORDER BY field_name""".stripMargin
    ) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      TypedSchema.indexStats(docs,
          Map("lang" -> col("lang"), "source" -> col("source")))
        .orderBy(col("field_name"))
    },
  )
}
