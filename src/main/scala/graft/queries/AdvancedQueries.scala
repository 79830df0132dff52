package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{CrossCollection, Mmr, MultiVec, Sparse, TermOverlap}
import graft.functions.Distances

/** Advanced-search operator queries (SURVEY.md §2.3/§2.5): sparse vectors,
  * MaxSim multi-vector, cross-collection merge, MMR, term-overlap rerank,
  * matryoshka two-phase.
  */
object AdvancedQueries {

  /** Sparse view of `embeddings`: dims with |x| > 0.05 (both engines build
    * it identically from the dense column).
    */
  private val duckSparse =
    """post AS (
      |  SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS idx,
      |         unnest(embedding) AS value
      |  FROM embeddings
      |),
      |sp AS (SELECT id, idx, value FROM post WHERE abs(value) > 0.05),
      |q AS (SELECT idx, value AS qval FROM sp WHERE id = 0)""".stripMargin

  private def sparsePostings(s: org.apache.spark.sql.SparkSession, dir: String) =
    Sparse.sparsify(Tables.load(s, dir, "embeddings"),
      col("vec_id"), col("embedding"), eps = 0.05)

  private def sparseQuery(s: org.apache.spark.sql.SparkSession, dir: String): Seq[(Int, Float)] =
    sparsePostings(s, dir).filter(col("id") === 0)
      .select(col("idx"), col("value"))
      .collect().map(r => (r.getInt(0), r.getFloat(1))).toSeq

  val defs: Map[String, Q] = Map(
    // Typed vector namespaces: weighted RRF across two named vector
    // fields (services/collection/vector_namespace.rs:271-302 — score =
    // weight/(rank0+60), per-field k·3 over-fetch). Field "emb" is the
    // embedding, field "rev" its reversal, weights 1.0 / 0.5, both
    // cosine; distances round to 6 before ranking so the per-field
    // ranks (tie-broken by id) are engine-identical, and the two-term
    // fused sum is commutative so aggregation order cannot matter.
    "namespace_fusion" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |emb AS (
        |  SELECT CAST(vec_id AS VARCHAR) AS id,
        |         round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS d
        |  FROM embeddings, q),
        |rev AS (
        |  SELECT CAST(vec_id AS VARCHAR) AS id,
        |         round(1 - list_cosine_similarity(list_reverse(embedding)::DOUBLE[], qv::DOUBLE[]), 6) AS d
        |  FROM embeddings, q),
        |re AS (SELECT id, row_number() OVER (ORDER BY d, id) - 1 AS r
        |       FROM emb ORDER BY d, id LIMIT 30),
        |rr AS (SELECT id, row_number() OVER (ORDER BY d, id) - 1 AS r
        |       FROM rev ORDER BY d, id LIMIT 30),
        |scored AS (
        |  SELECT id, 1.0::DOUBLE / (r + 60.0::DOUBLE) AS s FROM re
        |  UNION ALL
        |  SELECT id, 0.5::DOUBLE / (r + 60.0::DOUBLE) AS s FROM rr)
        |SELECT id, round(sum(s), 6) AS score
        |FROM scored GROUP BY id
        |ORDER BY sum(s) DESC, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      import graft.ops.VectorNamespace
      import graft.ops.VectorNamespace.FieldQuery
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id").cast("string").as("id"),
          col("embedding").as("emb"), reverse(col("embedding")).as("rev"))
      val qv = emb.filter(col("id") === "0").select("emb")
        .collect()(0).getSeq[Float](0).toArray
      VectorNamespace.fusionSearch(emb, col("id"),
          Seq(FieldQuery("emb", col("emb"), "cosine", qv, 1.0),
            FieldQuery("rev", col("rev"), "cosine", qv, 0.5)),
          k = 10, distanceColumn = c => round(c, 6))
        .select(col("id"), round(col("score"), 6).as("score"))
    },

    // Sparse dot-product top-k (reference: src/indexing/sparse.rs:511-560).
    "sparse_dot" -> Q(
      s"""WITH $duckSparse
         |SELECT sp.id, round(sum(sp.value::DOUBLE * q.qval::DOUBLE), 6) AS score
         |FROM sp JOIN q USING (idx)
         |GROUP BY sp.id
         |ORDER BY sum(sp.value::DOUBLE * q.qval::DOUBLE) DESC, sp.id
         |LIMIT 10""".stripMargin
    ) { (s, dir) =>
      Sparse.searchDot(sparsePostings(s, dir), sparseQuery(s, dir), 10)
        .select(col("id"), round(col("score"), 6).as("score"))
    },

    // Sparse cosine top-k (reference: sparse.rs:555-610) — norms over the
    // sparse values only.
    "sparse_cosine" -> Q(
      s"""WITH $duckSparse,
         |norms AS (SELECT id, sqrt(sum(value::DOUBLE * value::DOUBLE)) AS norm FROM sp GROUP BY id),
         |qn AS (SELECT sqrt(sum(qval::DOUBLE * qval::DOUBLE)) AS qnorm FROM q),
         |dots AS (SELECT sp.id, sum(sp.value::DOUBLE * q.qval::DOUBLE) AS dot
         |         FROM sp JOIN q USING (idx) GROUP BY sp.id)
         |SELECT d.id, round(CASE WHEN n.norm > 0 THEN d.dot / (n.norm * qn.qnorm) ELSE 0 END, 6) AS score
         |FROM dots d JOIN norms n USING (id), qn
         |ORDER BY CASE WHEN n.norm > 0 THEN d.dot / (n.norm * qn.qnorm) ELSE 0 END DESC, d.id
         |LIMIT 10""".stripMargin
    ) { (s, dir) =>
      Sparse.searchCosine(sparsePostings(s, dir), sparseQuery(s, dir), 10)
        .select(col("id"), round(col("score"), 6).as("score"))
    },

    // MaxSim over label-groups-as-documents (reference:
    // src/indexing/multivec.rs:206-243): each label's vectors are one
    // document's token embeddings; query = the 4 vectors vec_id < 4.
    "maxsim" -> Q(
      """WITH q AS (SELECT vec_id AS qtok_id, embedding AS qvec FROM embeddings WHERE vec_id < 4),
        |sims AS (
        |  SELECT e.label AS doc_id, q.qtok_id,
        |         max(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[])) AS max_sim
        |  FROM embeddings e, q
        |  GROUP BY e.label, q.qtok_id
        |)
        |SELECT doc_id, round(sum(max_sim), 6) AS score
        |FROM sims GROUP BY doc_id
        |ORDER BY sum(max_sim) DESC, doc_id LIMIT 5""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val docTokens = emb.select(col("label").as("doc_id"),
        col("embedding").as("vector"))
      val qToks = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("qtok_id"), col("embedding").as("qvec"))
      MultiVec.maxSim(docTokens, qToks, k = 5)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
    },

    // Two-stage MaxSim (reference: multivec.rs:275-331): centroid coarse
    // ranking (f32-truncated centroids) keeps k×2 candidate docs, exact
    // MaxSim re-rank.
    "maxsim_two_stage" -> Q(
      """WITH q AS (SELECT vec_id AS qtok_id, embedding AS qvec FROM embeddings WHERE vec_id < 4),
        |unn AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
        |               unnest(embedding)::DOUBLE AS x FROM embeddings),
        |cent AS (SELECT label, dim, avg(x)::FLOAT AS v FROM unn GROUP BY label, dim),
        |cvec AS (SELECT label, list(v ORDER BY dim) AS c FROM cent GROUP BY label),
        |qunn AS (SELECT generate_subscripts(qvec, 1) AS dim, unnest(qvec)::DOUBLE AS x FROM q),
        |qcent AS (SELECT dim, avg(x)::FLOAT AS v FROM qunn GROUP BY dim),
        |qcvec AS (SELECT list(v ORDER BY dim) AS qc FROM qcent),
        |cands AS (
        |  SELECT c.label FROM cvec c, qcvec
        |  ORDER BY list_cosine_similarity(c.c::DOUBLE[], qcvec.qc::DOUBLE[]) DESC, c.label
        |  LIMIT 6
        |),
        |sims AS (
        |  SELECT e.label AS doc_id, q.qtok_id,
        |         max(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[])) AS max_sim
        |  FROM embeddings e JOIN cands ON e.label = cands.label, q
        |  GROUP BY e.label, q.qtok_id
        |)
        |SELECT doc_id, round(sum(max_sim), 6) AS score
        |FROM sims GROUP BY doc_id
        |ORDER BY sum(max_sim) DESC, doc_id LIMIT 3""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val docTokens = emb.select(col("label").as("doc_id"),
        col("embedding").as("vector"))
      val qToks = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("qtok_id"), col("embedding").as("qvec"))
      MultiVec.maxSimTwoStage(docTokens, qToks, k = 3, candidateMultiplier = 2)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
    },

    // End-to-end GraphRAG (reference: graphrag.rs): extract entities from
    // documents, build co-occurrence edges, hybrid vector+graph search
    // seeded by embedding similarity. Fully oracle-gated (r7 verdict #6):
    // the extraction heuristic reduces to SQL — after initcap, a word
    // yields an entity iff its RAW first char is a letter (initcap
    // uppercases exactly the word-leading letter and entity_id lowercases
    // the name anyway), so DuckDB replays extraction → co-occurrence →
    // per-entity centroid → seeds → two unrolled BFS hops → max-merge.
    "graphrag_search" -> Q(
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |sent AS (SELECT doc_id, unnest(string_split(text, '. ')) AS sentence FROM docs),
        |words0 AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(sentence, '\s+'), w -> w <> '') AS ws
        |  FROM sent
        |),
        |tok AS (SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i FROM words0),
        |ent AS (
        |  SELECT DISTINCT doc_id,
        |         'entity_' || lower(regexp_replace(w, '[^a-zA-Z0-9]+$', '')) AS entity_id
        |  FROM tok
        |  WHERE i >= 2 AND length(w) >= 2 AND regexp_matches(w, '^[a-zA-Z]')
        |),
        |edg AS (
        |  SELECT a.entity_id AS src, b.entity_id AS dst
        |  FROM ent a JOIN ent b ON a.doc_id = b.doc_id AND a.entity_id < b.entity_id
        |  GROUP BY 1, 2
        |),
        |und AS (SELECT DISTINCT src, dst FROM
        |        (SELECT src, dst FROM edg UNION ALL SELECT dst, src FROM edg)),
        |docemb AS (SELECT vec_id AS doc_id, embedding FROM embeddings WHERE vec_id < 200),
        |unn AS (
        |  SELECT e.entity_id, generate_subscripts(m.embedding, 1) AS dim,
        |         unnest(m.embedding)::DOUBLE AS x
        |  FROM ent e JOIN docemb m USING (doc_id)
        |),
        |cent AS (SELECT entity_id, dim, avg(x)::FLOAT AS v FROM unn GROUP BY entity_id, dim),
        |evec AS (SELECT entity_id, list(v ORDER BY dim) AS vec FROM cent GROUP BY entity_id),
        |q AS (SELECT vec AS qv FROM evec
        |      WHERE entity_id = (SELECT min(entity_id) FROM evec)),
        |seed0 AS (
        |  SELECT e.entity_id AS id,
        |         1 - list_cosine_similarity(e.vec::DOUBLE[], q.qv::DOUBLE[]) AS d
        |  FROM evec e, q ORDER BY d, id LIMIT 10
        |),
        |mx AS (SELECT greatest(max(d), 1e-6) AS maxd FROM seed0),
        |seeds AS (
        |  SELECT id, 1.0 - d / maxd AS vector_score, 1.0 AS graph_score,
        |         0 AS hop_count, 0.7 * (1.0 - d / maxd) + 0.3 AS combined_score
        |  FROM seed0, mx
        |),
        |hop1 AS (
        |  SELECT u.dst AS id, max(s.vector_score) AS vector_score
        |  FROM und u JOIN seeds s ON u.src = s.id GROUP BY u.dst
        |),
        |hop1s AS (
        |  SELECT id, vector_score, 0.5 AS graph_score, 1 AS hop_count,
        |         0.7 * vector_score + 0.3 * 0.5 AS combined_score
        |  FROM hop1
        |),
        |best1 AS (
        |  SELECT id, vector_score, graph_score, hop_count, combined_score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id
        |               ORDER BY combined_score DESC, hop_count ASC) AS r
        |    FROM (SELECT * FROM seeds UNION ALL SELECT * FROM hop1s)
        |  ) WHERE r = 1
        |),
        |frontier2 AS (
        |  SELECT id, vector_score FROM hop1s
        |  WHERE id NOT IN (SELECT id FROM seeds)
        |),
        |hop2 AS (
        |  SELECT u.dst AS id, max(f.vector_score) AS vector_score
        |  FROM und u JOIN frontier2 f ON u.src = f.id GROUP BY u.dst
        |),
        |hop2s AS (
        |  SELECT id, vector_score, 1.0/3.0 AS graph_score, 2 AS hop_count,
        |         0.7 * vector_score + 0.3 * (1.0/3.0) AS combined_score
        |  FROM hop2
        |),
        |best2 AS (
        |  SELECT id, vector_score, graph_score, hop_count, combined_score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id
        |               ORDER BY combined_score DESC, hop_count ASC) AS r
        |    FROM (SELECT * FROM best1 UNION ALL SELECT * FROM hop2s)
        |  ) WHERE r = 1
        |),
        |sel AS (SELECT * FROM best2 ORDER BY combined_score DESC, id LIMIT 10)
        |SELECT id, round(vector_score, 6) AS vector_score,
        |       round(graph_score, 6) AS graph_score,
        |       CAST(hop_count AS BIGINT) AS hop_count,
        |       round(combined_score, 6) AS combined_score
        |FROM sel""".stripMargin
    ) { (s, dir) =>
      import graft.ops.GraphRag
      // the entity graph is persistent index state (the reference builds
      // it once at ingest, graphrag.rs) — cache per source dir so the
      // gate measures search, not graph construction
      val (entVecs, edges) = graft.core.IndexCache.getOrBuild(s"graphrag:$dir") {
        // the synthetic corpus is all-lowercase; initcap makes every word
        // a capitalized concept so the extraction heuristic finds entities
        val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
          .withColumn("text", initcap(col("text")))
        val ents = GraphRag.extractEntities(docs, col("doc_id"), col("text"))
        val e = GraphRag.cooccurrenceEdges(ents).persist()
        // entity embedding = centroid of its documents' embeddings
        val emb0 = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 200)
          .select(col("vec_id").as("doc_id"), col("embedding"))
        val ev = graft.ops.VectorAnalytics.centroidVec(
          ents.join(emb0, "doc_id"), col("embedding"), Seq(col("entity_id")))
          .select(col("entity_id").as("id"), col("centroid").as("vector"))
          .persist()
        (ev, e)
      }
      // deterministic query vector: the MIN entity's own centroid. With an
      // arbitrary corpus vector (the old vec_id 0 query), isotropic seed
      // distances made every seed's vector_score ≤ 0.14, so hop nodes
      // (combined ≤ 0.7·vs + 0.15) could never displace the weakest seed
      // (combined 0.3) and the whole expansion loop was gate-dead (r19
      // audit: the hop-decay mutation was GREEN). Querying an entity
      // centroid pins vs=1.0 at the top, so its non-seed co-occurrence
      // neighbors outrank weak seeds and hop-1 rows reach the output.
      val q = entVecs.filter(col("id") ===
          entVecs.agg(min(col("id"))).collect()(0).getString(0))
        .select("vector").collect()(0).getSeq[Float](0).toArray
      GraphRag.search(entVecs, edges, q, k = 10, maxHops = 2)
        .select(col("id"),
          round(col("vector_score"), 6).as("vector_score"),
          round(col("graph_score"), 6).as("graph_score"),
          col("hop_count").cast("long").as("hop_count"),
          round(col("combined_score"), 6).as("combined_score"))
    },

    // Semantic k-NN graph edges (reference: experimental/graph.rs:116-270):
    // per-node top-3 neighbors by cosine, similarity = 1 - min(dist, 1),
    // threshold 0.3, on a bounded slice.
    "graph_knn_edges" -> Q(
      """WITH pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst,
        |         1 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS d
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 100 AND b.vec_id < 100
        |),
        |ranked AS (
        |  SELECT src, dst, 1 - least(d, 1) AS similarity,
        |         row_number() OVER (PARTITION BY src ORDER BY d, dst) AS r
        |  FROM pairs
        |)
        |SELECT src, dst, round(similarity, 6) AS similarity
        |FROM ranked WHERE r <= 3 AND similarity >= 0.3
        |ORDER BY src, dst""".stripMargin
    ) { (s, dir) =>
      // the BLOCKED build (scale path) against the exact-kNN oracle: with
      // multi-probe at these settings recall is 1.0 on this slice, so the
      // hash must match the all-pairs DuckDB result
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 100)
      graft.ops.SemanticGraph.buildBlocked(emb, col("vec_id"), col("embedding"),
        k = 3, threshold = Some(0.3), numCells = 8, nprobe = 6)
        .select(col("src"), col("dst"), round(col("similarity"), 6).as("similarity"))
        .orderBy(col("src"), col("dst"))
    },

    // Collection branching (reference: collection_branch.rs): main = docs
    // <100; branch 'exp' patches 0-9, adds 1000-1004, tombstones 90-99;
    // merge exp→main (SourceWins), then resolve main. The oracle replays
    // the same copy-on-write algebra in SQL.
    "branch_resolve" -> Q(
      """SELECT doc_id, text FROM (
        |  SELECT doc_id, 'patched: ' || text AS text FROM documents WHERE doc_id < 10
        |  UNION ALL
        |  SELECT doc_id + 1000, 'new document ' || doc_id FROM documents WHERE doc_id < 5
        |  UNION ALL
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 10 AND doc_id < 90
        |) ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.ops.Branching._
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val t = new BranchTree(docs, idCol = "doc_id")
      t.createBranch("exp", "main")
      t.upsert("exp", docs.filter(col("doc_id") < 10)
        .select(col("doc_id"), concat(lit("patched: "), col("text")).as("text")))
      t.upsert("exp", docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 1000).as("doc_id"),
          concat(lit("new document "), col("doc_id").cast("string")).as("text")))
      t.delete("exp", (90 until 100).map(_.toString))
      t.merge("exp", "main", MergeStrategy.SourceWins)
      t.resolve("main").orderBy(col("doc_id"))
    },

    // Branch diff statuses against the target's visible state.
    "branch_diff" -> Q(
      // ids 0 and 1 are upserted FIRST and deleted AFTER: latest-change-
      // wins layer precedence must report them 'deleted' (an inverted
      // precedence keeps the earlier upsert → 'modified' — the r18 audit
      // found the previous disjoint-id fixture never arbitrated between
      // two changes to the same id, leaving precedence unobservable here).
      """SELECT doc_id, CASE WHEN doc_id >= 1000 THEN 'added'
        |                    WHEN doc_id < 2 THEN 'deleted'
        |                    WHEN doc_id < 10 THEN 'modified'
        |                    ELSE 'deleted' END AS status
        |FROM (SELECT doc_id FROM documents WHERE doc_id < 10
        |      UNION ALL SELECT doc_id + 1000 FROM documents WHERE doc_id < 5
        |      UNION ALL SELECT doc_id FROM documents WHERE doc_id BETWEEN 90 AND 99)
        |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      import graft.ops.Branching._
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val t = new BranchTree(docs, idCol = "doc_id")
      t.createBranch("exp", "main")
      t.upsert("exp", docs.filter(col("doc_id") < 10)
        .select(col("doc_id"), concat(lit("patched: "), col("text")).as("text")))
      t.upsert("exp", docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 1000).as("doc_id"),
          concat(lit("new document "), col("doc_id").cast("string")).as("text")))
      t.delete("exp", (90 until 100).map(_.toString))
      t.delete("exp", Seq("0", "1"))
      t.diff("exp", "main")
    },

    // Collection diff (reference CLI `diff`, search.rs:289-338): source =
    // ids [0,150), target = ids [50,200) with the [50,100) vectors doubled
    // (×2 is exact in f32, so both engines see identical inputs) →
    // removed / added / modified / unchanged by L2 threshold.
    "collection_diff" -> Q(
      """WITH src AS (SELECT vec_id AS id, embedding AS v FROM embeddings WHERE vec_id < 150),
        |tgt AS (SELECT vec_id AS id,
        |               CASE WHEN vec_id < 100 THEN list_transform(embedding, x -> x * 2)
        |                    ELSE embedding END AS v
        |        FROM embeddings WHERE vec_id >= 50 AND vec_id < 200)
        |SELECT coalesce(s.id, t.id) AS id,
        |       CASE WHEN t.id IS NULL THEN 'removed'
        |            WHEN s.id IS NULL THEN 'added'
        |            WHEN round(sqrt(list_sum(list_transform(list_zip(s.v, t.v),
        |                   p -> (p[1]::DOUBLE - p[2]::DOUBLE) ** 2))), 6) > 0.000001
        |              THEN 'modified' ELSE 'unchanged' END AS status,
        |       CASE WHEN s.id IS NOT NULL AND t.id IS NOT NULL
        |            THEN round(sqrt(list_sum(list_transform(list_zip(s.v, t.v),
        |                   p -> (p[1]::DOUBLE - p[2]::DOUBLE) ** 2))), 6) END AS l2_distance
        |FROM src s FULL OUTER JOIN tgt t ON s.id = t.id
        |ORDER BY id""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val src = emb.filter(col("vec_id") < 150)
        .select(col("vec_id").as("id"), col("embedding").as("vector"))
      val tgt = emb.filter(col("vec_id") >= 50 && col("vec_id") < 200)
        .select(col("vec_id").as("id"),
          when(col("vec_id") < 100,
            transform(col("embedding"), x => x * lit(2.0f)))
            .otherwise(col("embedding")).as("vector"))
      graft.ops.CollectionDiff.diff(src, tgt, threshold = 0.000001,
        roundTo = Some(6))
        .orderBy(col("id"))
    },

    // Cross-collection search: two collections over the same id space,
    // same query, DIFFERENT metrics (cosine vs euclidean); MinScore merge
    // dedups by id keeping the lower distance (reference:
    // src/search/cross_collection.rs:316-341). The metric split makes the
    // two top-20 lists overlap completely (measured: 20/20 common ids at
    // sf0.01) with distinct distance values per collection, so the
    // keep-LOWEST arbitration decides every merged row — r19 audit: the
    // original fixture queried two different vectors, whose isotropic
    // top-20 neighborhoods were disjoint, leaving the keep rule with
    // nothing to arbitrate (its inversion was gate-invisible).
    "cross_collection_min" -> Q(
      """WITH q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |a AS (
        |  SELECT vec_id AS id, round(1 - list_cosine_similarity(embedding::DOUBLE[], q0.qv::DOUBLE[]), 6) AS distance,
        |         'colA' AS collection
        |  FROM embeddings, q0 ORDER BY distance, id LIMIT 20
        |),
        |b AS (
        |  SELECT vec_id AS id, round(list_distance(embedding::DOUBLE[], q0.qv::DOUBLE[]), 6) AS distance,
        |         'colB' AS collection
        |  FROM embeddings, q0 ORDER BY distance, id LIMIT 20
        |),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY distance, collection) AS rn
        |  FROM u
        |)
        |SELECT id, distance, collection FROM best WHERE rn = 1
        |ORDER BY distance, id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      def top20(metric: String) = {
        val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        emb.crossJoin(broadcast(qv))
          .select(col("vec_id").as("id"),
            round(Distances.distance(metric, col("embedding"), col("qv")), 6)
              .as("distance"))
          .orderBy(col("distance").asc, col("id").asc)
          .limit(20)
      }
      CrossCollection.merge(
        Seq("colA" -> top20("cosine"), "colB" -> top20("euclidean")), k = 10,
        CrossCollection.Merge.MinScore)
        .select(col("id"), col("distance"), col("collection"))
    },

    // Matryoshka two-phase search (reference:
    // src/collection/search_methods.rs:127-180): coarse top-(k×2) on the
    // 16-dim prefix, full-dim re-rank.
    "matryoshka" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |coarse AS (
        |  SELECT e.vec_id, e.embedding, q.qv
        |  FROM embeddings e, q
        |  ORDER BY round(1 - list_cosine_similarity(e.embedding[1:16]::DOUBLE[], q.qv[1:16]::DOUBLE[]), 6), e.vec_id
        |  LIMIT 20
        |)
        |SELECT vec_id, round(1 - list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6) AS distance
        |FROM coarse
        |ORDER BY distance, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val coarse = emb.crossJoin(broadcast(qv))
        .withColumn("__coarse",
          round(Distances.cosine(slice(col("embedding"), 1, 16),
            slice(col("qv"), 1, 16)), 6))
        .orderBy(col("__coarse").asc, col("vec_id").asc)
        .limit(20)
      coarse
        .select(col("vec_id"),
          round(Distances.cosine(col("embedding"), col("qv")), 6).as("distance"))
        .orderBy(col("distance").asc, col("vec_id").asc)
        .limit(10)
    },

    // Matryoshka COARSE-DISTANCE REPORTING with level correction
    // (reference: quantization.rs:810-823): the two-phase query above
    // re-ranks exactly and needs no correction, but the adaptive path
    // reports corrected coarse distances — raw / variance_ratio for the
    // level. The engine here carries a PINNED ratio (0.28125 = 9/32,
    // exactly representable in binary, so the division is bit-identical
    // in Spark and DuckDB); calibration itself is covered by the
    // MatryoshkaSpec sample tests. This puts Engine.correctDistance —
    // previously ScalaTest-only — under the driver hash gate.
    "matryoshka_corrected" -> Q(
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |       round((1 - list_cosine_similarity(e.embedding[1:16]::DOUBLE[], q.qv[1:16]::DOUBLE[])) * (1.0 / 0.28125), 6) AS corrected
        |FROM embeddings e, q
        |ORDER BY corrected, e.vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val engine = graft.ann.Matryoshka(fullDims = 64, levels = Seq(16))
        .copy(varianceRatios = Seq(0.28125))
      val emb = Tables.load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      emb.crossJoin(broadcast(qv))
        .select(col("vec_id"),
          round(engine.correctDistanceCol(
            Distances.cosine(slice(col("embedding"), 1, 16),
              slice(col("qv"), 1, 16)), 16), 6).as("corrected"))
        .orderBy(col("corrected").asc, col("vec_id").asc)
        .limit(10)
    },

    // TF-IDF term-overlap rerank (reference: src/search/reranker.rs:362-466).
    "term_overlap_rerank" -> Q(
      """WITH docs AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 100),
        |dterms AS (SELECT doc_id, list_distinct(string_split_regex(t, '\s+')) AS terms FROM docs),
        |qt AS (SELECT term, count(*) AS qc
        |       FROM (SELECT unnest(['spark', 'query', 'batch', 'data']) AS term) GROUP BY term),
        |post AS (SELECT d.doc_id, len(d.terms) AS doc_len, unnest(d.terms) AS term FROM dterms d),
        |m AS (SELECT post.* , qt.qc FROM post JOIN qt USING (term)),
        |dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM m GROUP BY term),
        |sc AS (SELECT m.doc_id, m.doc_len,
        |              sum((ln((100 + 1.0) / (dfs.df + 1.0)) + 1.0) * m.qc) AS s
        |       FROM m JOIN dfs USING (term) GROUP BY m.doc_id, m.doc_len)
        |SELECT d.doc_id,
        |       round(coalesce(sc.s / (sqrt(greatest(sc.doc_len, 1)) * 4), 0.0), 6) AS score
        |FROM (SELECT doc_id FROM docs) d LEFT JOIN sc USING (doc_id)
        |ORDER BY round(coalesce(sc.s / (sqrt(greatest(sc.doc_len, 1)) * 4), 0.0), 6) DESC, d.doc_id
        |LIMIT 10""".stripMargin
    ) { (s, dir) =>
      TermOverlap.rerank(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 100),
        "spark query batch data", idCol = "doc_id", textCol = "text", topK = 100)
        .select(col("id").as("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
    },

    // MMR diversification (reference: src/integrations/langchain.rs:802-856)
    // — the greedy argmax loop replicates in DuckDB as a recursive CTE
    // carrying the selected (ids, embeddings) lists, so the whole
    // selection is a full hash oracle. Scores are compared UNROUNDED on
    // both sides (the discrete argmax absorbs last-ulp noise); the
    // seed/tie rule (pool order = rounded distance asc, vec_id asc;
    // ties → earliest pool rank) matches Mmr.select exactly.
    "mmr_diversify" -> Q(
      """WITH RECURSIVE
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |pool AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb,
        |         row_number() OVER (
        |           ORDER BY round(1 - list_cosine_similarity(embedding::DOUBLE[], qv), 6),
        |                    vec_id) - 1 AS rnk
        |  FROM embeddings, q
        |  QUALIFY rnk < 50
        |),
        |sel AS (
        |  SELECT 0 AS step, [p.vec_id] AS ids, [p.emb] AS embs
        |  FROM pool p WHERE p.rnk = 0
        |  UNION ALL
        |  SELECT s.step + 1, list_append(s.ids, c.vec_id), list_append(s.embs, c.emb)
        |  FROM sel s, LATERAL (
        |    SELECT p.vec_id, p.emb
        |    FROM pool p, q
        |    WHERE NOT list_contains(s.ids, p.vec_id)
        |    ORDER BY 0.7 * list_cosine_similarity(p.emb, q.qv)
        |           - 0.3 * list_max(list_transform(s.embs,
        |               e -> list_cosine_similarity(p.emb, e))) DESC,
        |           p.rnk ASC
        |    LIMIT 1
        |  ) c
        |  WHERE s.step < 9
        |)
        |SELECT CAST(ids[step + 1] AS VARCHAR) AS vec_id,
        |       CAST(step AS BIGINT) AS selection_order
        |FROM sel ORDER BY selection_order""".stripMargin
    ) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val query = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
      val pool = emb.crossJoin(broadcast(qv))
        .withColumn("distance",
          round(Distances.cosine(col("embedding"), col("qv")), 6))
        .orderBy(col("distance").asc, col("vec_id").asc)
        .limit(50)
        .select(col("vec_id"), col("embedding"))
      Mmr.diversify(pool, "vec_id", "embedding", query, k = 10, lambda = 0.7)
        .select(col("vec_id"), col("selection_order").cast("long")
          .as("selection_order"))
        .orderBy(col("selection_order"))
    },
  )
}
