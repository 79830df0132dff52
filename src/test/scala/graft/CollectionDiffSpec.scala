package graft

import org.apache.spark.sql.functions._

import graft.ops.CollectionDiff
import graft.ops.CollectionDiff.MergeStrategy

class CollectionDiffSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (String, Array[Float])*) =
    rows.toDF("id", "vector")

  test("diff classifies removed/added/modified/unchanged") {
    val src = frame("a" -> Array(1f, 0f), "b" -> Array(0f, 1f), "c" -> Array(1f, 1f))
    val tgt = frame("b" -> Array(0f, 1f), "c" -> Array(2f, 2f), "d" -> Array(3f, 3f))
    val got = CollectionDiff.diff(src, tgt, threshold = 0.5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "removed", "b" -> "unchanged",
      "c" -> "modified", "d" -> "added"))
  }

  test("2-way merge: source-wins replaces shared, target-wins keeps, new ids always added") {
    val src = frame("a" -> Array(9f, 9f), "x" -> Array(5f, 5f))
    val tgt = frame("a" -> Array(1f, 1f), "b" -> Array(2f, 2f))
    val sw = CollectionDiff.merge(src, tgt, None, MergeStrategy.SourceWins)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1).head).toMap
    assert(sw == Map("a" -> 9f, "b" -> 2f, "x" -> 5f))
    val tw = CollectionDiff.merge(src, tgt, None, MergeStrategy.TargetWins)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1).head).toMap
    assert(tw == Map("a" -> 1f, "b" -> 2f, "x" -> 5f))
  }

  test("3-way merge: only-source-changed takes source, only-target-changed keeps target, both-changed applies strategy") {
    val base = frame("s" -> Array(0f, 0f), "t" -> Array(0f, 0f), "x" -> Array(0f, 0f))
    val src = frame("s" -> Array(1f, 0f), // source changed s
                    "t" -> Array(0f, 0f), // source kept t
                    "x" -> Array(5f, 0f)) // both changed x
    val tgt = frame("s" -> Array(0f, 0f), // target kept s
                    "t" -> Array(0f, 9f), // target changed t
                    "x" -> Array(7f, 0f)) // both changed x
    val sw = CollectionDiff.merge(src, tgt, Some(base), MergeStrategy.SourceWins)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(sw("s") == Seq(1f, 0f)) // source-only change wins regardless
    assert(sw("t") == Seq(0f, 9f)) // target-only change kept
    assert(sw("x") == Seq(5f, 0f)) // conflict → source-wins
    val tw = CollectionDiff.merge(src, tgt, Some(base), MergeStrategy.TargetWins)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(tw("s") == Seq(1f, 0f)) // still source (only source changed)
    assert(tw("x") == Seq(7f, 0f)) // conflict → target kept
  }
}
