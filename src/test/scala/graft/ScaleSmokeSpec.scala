package graft

import org.apache.spark.sql.functions._

/** Bounded-time scale smoke tests: the blocked/banded operators run at
  * 10-20k rows — two orders past the oracle fixtures — and must finish in
  * seconds because their work is candidate-bounded, where the naive
  * quadratic forms would materialize 10⁸+ pairs. Complements
  * PlanAuditSpec (which proves the SHAPE) with an execution-level check.
  */
class ScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  test("blocked graph build at 10k vectors stays candidate-bounded") {
    val rnd = new scala.util.Random(13)
    val centers = Array.tabulate(16)(i =>
      Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    val data = (0 until 10000).map { i =>
      val c = centers(i % 16)
      (s"v$i", c.map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    }.toDF("id", "vector").repartition(8)
    val edges = graft.ops.SemanticGraph.buildBlocked(
      data, col("id"), col("vector"), k = 5, numCells = 64, nprobe = 2)
    val n = edges.count()
    // every node found k neighbors through its probed cells
    assert(n == 10000L * 5, s"edge count $n")
  }

  test("minhash LSH dedup at 10k docs with 1k planted dups") {
    val docs = ((0 until 10000).map { i =>
      (i.toLong, s"document number $i talks about topic${i % 50} with unique token u$i and filler words")
    } ++ (0 until 1000).map { i =>
      (100000L + i, s"document number $i talks about topic${i % 50} with unique token u$i and filler words")
    }).toDF("id", "text").repartition(8)
    val pairs = graft.pipeline.Dedup.minhashLsh(docs, col("id"), col("text"),
      n = 3, k = 64, bands = 16, threshold = 0.9)
    val planted = pairs
      .filter(col("id_b") === col("id_a") + 100000 && col("est_jaccard") === 1.0)
      .count()
    assert(planted == 1000L, s"planted pairs recovered: $planted")
  }

  test("ngram jaccard at 10k docs sharing a corpus-wide hot prefix") {
    // every doc opens with the same 5 tokens -> 3 hot shingles with
    // df=10050; candidate generation must never join through them
    val docs = ((0 until 10000).map { i =>
      (i.toLong, s"the quick brown fox jumps u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")
    } ++ (0 until 50).map { i =>
      (100000L + i, s"the quick brown fox jumps u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")
    }).toDF("id", "text").repartition(8)
    val got = graft.pipeline.Dedup.ngramJaccard(docs, col("id"), col("text"),
      threshold = 0.9, maxShingleFreq = 50)
      .filter(col("id_b") === col("id_a") + 100000)
      .count()
    assert(got == 50L, s"planted pairs found: $got")
  }
}
