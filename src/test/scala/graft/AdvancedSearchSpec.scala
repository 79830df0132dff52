package graft

import org.apache.spark.sql.functions._

import graft.ops.{CrossCollection, Mmr, MultiVec, Sparse, TermOverlap}

class SparseSpec extends SparkSpec {
  import spark.implicits._

  // docs: 1 = (0:1, 2:2), 2 = (2:3), 3 = (5:4) — query (0:1, 2:1)
  private lazy val posting = Seq(
    (1L, 0, 1f), (1L, 2, 2f), (2L, 2, 3f), (3L, 5, 4f)
  ).toDF("id", "idx", "value")

  test("dot search only scores overlapping docs, descending") {
    val got = Sparse.searchDot(posting, Seq((0, 1f), (2, 1f)), 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3.0), (2L, 3.0)).sortBy(-_._2) || got == Seq((1L, 3.0), (2L, 3.0)))
    assert(!got.exists(_._1 == 3L))
  }

  test("cosine normalizes by both norms") {
    val got = Sparse.searchCosine(posting, Seq((2, 1f)), 10)
      .as[(Long, Double)].collect().toMap
    // doc2: dot=3, norm=3, qnorm=1 -> 1.0; doc1: dot=2, norm=sqrt(5) -> 2/sqrt5
    assert(math.abs(got(2L) - 1.0) < 1e-12)
    assert(math.abs(got(1L) - 2.0 / math.sqrt(5)) < 1e-12)
  }

  test("threshold filters low scores") {
    val got = Sparse.searchWithThreshold(posting, Seq((0, 1f), (2, 1f)), 10, 3.0)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1).toSet == Set(1L, 2L))
    val strict = Sparse.searchWithThreshold(posting, Seq((0, 1f)), 10, 2.0)
      .as[(Long, Double)].collect()
    assert(strict.isEmpty)
  }

  test("sparsify drops near-zeros") {
    val got = Sparse.sparsify(Seq((1L, Array(0.01f, 0.5f, -0.9f))).toDF("id", "v"),
      col("id"), col("v"), 0.05).as[(Long, Int, Float)].collect().toSeq
    assert(got == Seq((1L, 1, 0.5f), (1L, 2, -0.9f)))
  }
}

class MultiVecSpec extends SparkSpec {
  import spark.implicits._

  test("maxsim sums per-query-token maxima") {
    // doc A tokens: e1, e2; doc B tokens: e2-ish. query: e1, e2
    val docs = Seq(
      ("A", Array(1f, 0f)), ("A", Array(0f, 1f)),
      ("B", Array(0f, 1f))).toDF("doc_id", "vector")
    val q = Seq((0, Array(1f, 0f)), (1, Array(0f, 1f))).toDF("qtok_id", "qvec")
    val got = MultiVec.maxSim(docs, q, 10).as[(String, Double)].collect().toMap
    assert(math.abs(got("A") - 2.0) < 1e-9) // both tokens matched exactly
    assert(math.abs(got("B") - 1.0) < 1e-9) // q0 max-sim 0, q1 sim 1
  }

  test("two-stage equals exact when multiplier covers all docs") {
    val docs = sf("embeddings").filter(col("vec_id") < 100)
      .select(col("label").as("doc_id"), col("embedding").as("vector"))
    val q = sf("embeddings").filter(col("vec_id") < 2)
      .select(col("vec_id").as("qtok_id"), col("embedding").as("qvec"))
    val exact = MultiVec.maxSim(docs, q, 3).as[(Int, Double)].collect().toSeq
    val twoStage = MultiVec.maxSimTwoStage(docs, q, 3, candidateMultiplier = 100)
      .as[(Int, Double)].collect().toSeq
    assert(exact.map(_._1) == twoStage.map(_._1))
  }
}

class CrossCollectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val colA = Seq((1L, 0.1), (2L, 0.4), (3L, 0.5)).toDF("id", "distance")
  private lazy val colB = Seq((2L, 0.2), (4L, 0.3)).toDF("id", "distance")

  test("min-score merge dedups keeping lowest distance") {
    val got = CrossCollection.merge(Seq("A" -> colA, "B" -> colB), 10)
      .select("id", "distance", "collection")
      .as[(Long, Double, String)].collect().toSeq
    assert(got == Seq((1L, 0.1, "A"), (2L, 0.2, "B"), (4L, 0.3, "B"), (3L, 0.5, "A")))
  }

  test("average merge") {
    val got = CrossCollection.merge(Seq("A" -> colA, "B" -> colB), 10,
      CrossCollection.Merge.Average)
      .select("id", "distance").as[(Long, Double)].collect().toMap
    assert(math.abs(got(2L) - 0.3) < 1e-12)
    assert(got(1L) == 0.1)
  }

  test("rrf merge favors ids ranked well in both") {
    val got = CrossCollection.merge(Seq("A" -> colA, "B" -> colB), 10,
      CrossCollection.Merge.Rrf)
      .select("id", "rrf_score").as[(Long, Double)].collect()
    val m = got.toMap
    // id2: rank2 in A + rank1 in B = 1/62 + 1/61 > id1: 1/61 only
    assert(m(2L) > m(1L))
    assert(got.head._1 == 2L)
  }
}

class MmrSpec extends SparkSpec {
  test("mmr trades relevance for diversity") {
    val q = Array(1f, 0f)
    // c1 most relevant; c2 nearly identical to c1; c3 orthogonal-ish
    val cands = Seq[(Any, Array[Float])](
      ("c1", Array(1f, 0f)),
      ("c2", Array(0.999f, 0.045f)),
      ("c3", Array(0.3f, 0.95f)))
    // high lambda: pure relevance order
    assert(Mmr.select(cands, q, 3, lambda = 1.0) == Seq("c1", "c2", "c3"))
    // low lambda: diversity promotes c3 over near-dup c2
    assert(Mmr.select(cands, q, 3, lambda = 0.3) == Seq("c1", "c3", "c2"))
    // seed is always the top-ranked candidate
    assert(Mmr.select(cands, q, 1, lambda = 0.0) == Seq("c1"))
  }
}

class TermOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("idf-weighted overlap, zero-score docs kept, length-normalized") {
    val docs = Seq(
      (1L, "spark shuffle join"),
      (2L, "spark spark spark"), // distinct terms: {spark} — same idf hit, shorter
      (3L, "nothing relevant here at all")).toDF("id", "text")
    val got = TermOverlap.rerank(docs, "spark join", topK = 10)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got(2)._2 == 0.0) // no-overlap doc present with score 0
    // doc1 matches 2 terms over sqrt(3); doc2 matches 1 over sqrt(1)
    val idfSpark = math.log((3 + 1.0) / (2 + 1.0)) + 1.0
    val idfJoin = math.log((3 + 1.0) / (1 + 1.0)) + 1.0
    assert(math.abs(got(0)._2 - (idfSpark + idfJoin) / (math.sqrt(3) * 2)) < 1e-9)
    assert(math.abs(got(1)._2 - idfSpark / (math.sqrt(1) * 2)) < 1e-9)
  }
}
