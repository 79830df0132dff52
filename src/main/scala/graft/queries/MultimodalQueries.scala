package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.multimodal.Multimodal
import graft.sources.Interchange

/** Multimodal + interchange queries. The decode oracle compares exact byte
  * counts (ratios × n recover integer counts, avoiding f32 rounding
  * boundaries); the JSONL roundtrip proves the columnar.rs interchange
  * schema end-to-end.
  */
object MultimodalQueries {

  val defs: Map[String, Q] = Map(
    // Batched stub decode over binary content: byte histogram buckets 6/7
    // (lowercase-ASCII range) recovered as exact counts.
    "multimodal_decode" -> Q(
      """WITH c AS (
        |  SELECT doc_id AS id, length(text)::BIGINT AS n_bytes,
        |         list_transform(range(1, length(text) + 1),
        |                        i -> ord(text[i])) AS codes
        |  FROM documents WHERE doc_id < 50
        |)
        |SELECT id, n_bytes,
        |       len(list_filter(codes, x -> x // 16 = 6))::BIGINT AS b6,
        |       len(list_filter(codes, x -> x // 16 = 7))::BIGINT AS b7
        |FROM c ORDER BY id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), encode(col("text"), "utf-8").as("bin"))
      val media = Multimodal.asMedia(docs, "doc_id", "bin", "image")
      Multimodal.decodeBatched(media)
        .select(col("id"), col("n_bytes"),
          round(element_at(col("features"), 7).cast("double") * col("n_bytes"))
            .cast("long").as("b6"),
          round(element_at(col("features"), 8).cast("double") * col("n_bytes"))
            .cast("long").as("b7"))
        .orderBy(col("id"))
    },

    // needle-columnar JSONL roundtrip (reference: src/indexing/columnar.rs):
    // export -> import -> project, compared against the source table.
    // Weighted-sum fusion across two modality vector columns (full
    // embedding + its 16-dim head as a second "modality"), weights 0.7/0.3
    // (reference: multimodal_fusion.rs WeightedSum, normalized by total
    // weight). Both modalities present on every row here; the
    // missing-modality path is covered by MultimodalFusionSpec.
    "multimodal_fusion" -> Q(
      """WITH m AS (
        |  SELECT vec_id, embedding AS full_vec, embedding[1:16] AS head_vec
        |  FROM embeddings
        |),
        |q AS (SELECT full_vec AS qf, head_vec AS qh FROM m WHERE vec_id = 0),
        |d AS (
        |  SELECT vec_id,
        |         round(1 - list_cosine_similarity(full_vec::DOUBLE[], qf::DOUBLE[]), 6) AS d_full,
        |         round(1 - list_cosine_similarity(head_vec::DOUBLE[], qh::DOUBLE[]), 6) AS d_head
        |  FROM m, q
        |)
        |SELECT vec_id,
        |       round((0.7 * d_full + 0.3 * d_head) / 1.0, 6) AS score,
        |       d_full, d_head
        |FROM d ORDER BY score, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      import graft.ops.MultimodalFusion
      import graft.ops.MultimodalFusion.{Modality, Strategy}
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").as("full_vec"),
          slice(col("embedding"), 1, 16).as("head_vec"))
      val q0 = emb.filter(col("vec_id") === 0)
        .select("full_vec", "head_vec").collect()(0)
      val fused = MultimodalFusion.search(emb, "vec_id",
        modalities = Map(
          "full" -> Modality("full_vec", weight = 0.7),
          "head" -> Modality("head_vec", weight = 0.3)),
        queries = Map(
          "full" -> q0.getSeq[Float](0).toArray,
          "head" -> q0.getSeq[Float](1).toArray),
        k = 10, Strategy.WeightedSum, roundTo = Some(6))
      // round the weighted sum of ROUNDED legs like the oracle does
      fused.select(col("vec_id"),
        round((col("d_full") * 0.7 + col("d_head") * 0.3) / 1.0, 6).as("score"),
        col("d_full"), col("d_head"))
        .orderBy(col("score"), col("vec_id"))
    },

    "jsonl_roundtrip" -> Q(
      """SELECT CAST(vec_id AS VARCHAR) AS id, len(embedding) AS dims,
        |       CAST(label AS VARCHAR) AS label
        |FROM embeddings WHERE vec_id < 100 ORDER BY id""".stripMargin
    ) { (s, dir) =>
      val out = java.nio.file.Files.createTempDirectory("graft-jsonl-q").toString
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id").as("id"), col("embedding").as("vector"),
          to_json(map(lit("label"), col("label").cast("string"))).as("metadata"))
      Interchange.exportJsonl(emb, s"$out/data", metaCol = Some("metadata"))
      Interchange.importJsonl(s, s"$out/data")
        .select(col("id"), size(col("vector")).as("dims"),
          get_json_object(col("metadata"), "$.label").as("label"))
        .orderBy(col("id"))
    },

    // Whole-database export/import (reference database/mod.rs:965-1020):
    // two collections exported to the JSONL interchange with a manifest,
    // imported back, and reduced to per-collection fingerprints — row
    // count, id sum, and a fixed-point vector-content sum. The oracle
    // computes the same fingerprints from the SOURCE parquet, so the gate
    // proves the round trip loses nothing: JSON shortest-round-trip float
    // text parses back to the identical f32, and both engines reduce
    // per-row f64 sums to µ-precision BIGINTs before the order-insensitive
    // global sum (the data_profile fixed-point pattern).
    "export_import_all" -> Q(
      """WITH src AS (
        |  SELECT 'all_vecs' AS collection, vec_id AS id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT 'even_vecs', vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0)
        |SELECT collection, count(*) AS n, CAST(sum(id) AS BIGINT) AS sum_id,
        |       CAST(sum(CAST(round(list_sum(embedding::DOUBLE[]) * 1000000)
        |                     AS BIGINT)) AS BIGINT) AS sum_vec_fp
        |FROM src GROUP BY collection ORDER BY collection""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vector"))
      val out = java.nio.file.Files
        .createTempDirectory("graft-exportall-q").toString
      Interchange.exportAll(
        Map("all_vecs" -> emb, "even_vecs" -> emb.filter(col("id") % 2 === 0)),
        out, "id", "vector", metaCol = None)
      val dims = emb.select(size(col("vector"))).head().getInt(0)
      val ones = Array.fill(dims)(1.0f)
      Interchange.importAll(s, out).toSeq.sortBy(_._1)
        .map { case (name, df) =>
          df.select(lit(name).as("collection"),
            col("id").cast("long").as("id"),
            // compiled dot with the ones vector = element sum in one pass
            (-graft.functions.Distances.distance("dot", col("vector"),
              lit(ones))).as("vs"))
        }.reduce(_ unionAll _)
        .groupBy(col("collection"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
          sum(round(col("vs") * 1e6, 0).cast("long")).as("sum_vec_fp"))
        .orderBy(col("collection"))
    },

    // Deterministic mock auto-embedding (reference insert_auto_text with
    // the Mock backend, src/ml/auto_embed.rs:542) — FULL hash oracle
    // since r5. The whole scheme replicates in DuckDB: FNV-1a over UTF-8
    // bytes and the LCG both run as wrapping-u64 HUGEINT arithmetic (the
    // LCG in closed form, state_j = A_j·h + B_j with precomputed A/B
    // constants); the f32 steps ((state>>>33).toFloat / u32::MAX * 2 - 1,
    // the final /norm) are emulated by casting every intermediate to
    // REAL — single-rounding equivalence makes a double op rounded to f32
    // equal the direct f32 op — and the norm replays the engine's
    // SEQUENTIAL double accumulation via list_reduce.
    "auto_embed" -> Q({
      val m = "18446744073709551616"
      val lcgA = BigInt(6364136223846793005L)
      val mod = BigInt(1) << 64
      // state_j = A_j * h + B_j (mod 2^64), j = 1..32
      val ab = Iterator.iterate((BigInt(1), BigInt(0))) {
        case (a, b) => ((a * lcgA) mod mod, (b * lcgA + 1) mod mod)
      }.drop(1).take(32).map { case (a, b) => s"[$a, $b]" }
        .mkString("[", ", ", "]")
      def mulmod(a: String, b: String) =
        s"((($a) % 4294967296 * ($b)) % $m + " +
          s"((($a) // 4294967296 * ($b)) % 4294967296) * 4294967296) % $m"
      def sgn(x: String) =
        s"CAST((($x) + 9223372036854775808) % $m - 9223372036854775808 AS BIGINT)"
      def xor64(a: String, b: String) =
        s"(CAST(xor(${sgn(a)}, ${sgn(b)}) AS HUGEINT) + $m) % $m"
      val fnvStep = mulmod(xor64("acc", "b"), "1099511628211")
      s"""WITH d AS (
        |  SELECT doc_id, hex(encode(text)) AS hx
        |  FROM documents WHERE doc_id < 100),
        |fnv AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(0, length(hx) // 2), j ->
        |        CAST((strpos('0123456789ABCDEF', substr(hx, 2*j + 1, 1)) - 1) * 16 +
        |             strpos('0123456789ABCDEF', substr(hx, 2*j + 2, 1)) - 1 AS HUGEINT))),
        |      (acc, b) -> $fnvStep) AS h
        |  FROM d),
        |emb AS (
        |  SELECT doc_id,
        |    list_transform($ab, ab ->
        |      CAST(CAST(CAST(CAST((${mulmod("ab[1]", "h")} + ab[2]) % $m
        |            // 8589934592 AS BIGINT) AS REAL)
        |          / CAST(4294967295 AS REAL) AS REAL) * 2 - 1 AS REAL)) AS vs
        |  FROM fnv),
        |nrm AS (
        |  SELECT doc_id, vs,
        |    CAST(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(vs, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |      (a, b) -> a + b)) AS REAL) AS n
        |  FROM emb)
        |SELECT doc_id,
        |  round(CAST(CAST(vs[1] / n AS REAL) AS DOUBLE), 6) AS e0,
        |  round(CAST(CAST(vs[16] / n AS REAL) AS DOUBLE), 6) AS e15,
        |  round(CAST(CAST(vs[32] / n AS REAL) AS DOUBLE), 6) AS e31
        |FROM nrm ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      Multimodal.autoEmbed(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 100),
        "text", dims = 32)
        .select(col("doc_id"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e0"),
          round(element_at(col("embedding"), 16).cast("double"), 6).as("e15"),
          round(element_at(col("embedding"), 32).cast("double"), 6).as("e31"))
        .orderBy(col("doc_id"))
    },
  )
}
