package graft

import org.apache.spark.sql.functions._

import graft.ops.Branching._

class BranchingSpec extends SparkSpec {
  import spark.implicits._

  private def tree = new BranchTree(
    Seq(("doc1", Array(1f, 2f))).toDF("id", "vector"))

  test("copy-on-write: branch overrides, main untouched (collection_branch.rs docs example)") {
    val t = tree
    t.createBranch("experiment", "main")
    t.upsert("experiment", Seq(("doc1", Array(3f, 4f)),
      ("doc2", Array(5f, 6f))).toDF("id", "vector"))
    assert(t.get("main", "doc1").get.getSeq[Float](1) == Seq(1f, 2f))
    assert(t.get("experiment", "doc1").get.getSeq[Float](1) == Seq(3f, 4f))
    assert(t.listIds("experiment") == Seq("doc1", "doc2"))
    assert(t.listIds("main") == Seq("doc1"))
    val r = t.merge("experiment", "main", MergeStrategy.SourceWins)
    assert(r.merged == 2)
    assert(t.get("main", "doc1").get.getSeq[Float](1) == Seq(3f, 4f))
  }

  test("deletes mask the parent chain; nested branches read through") {
    val t = tree
    t.upsert("main", Seq(("doc2", Array(9f, 9f))).toDF("id", "vector"))
    t.createBranch("a", "main")
    t.delete("a", Seq("doc1"))
    t.createBranch("b", "a") // grandchild sees a's tombstone
    assert(t.listIds("main") == Seq("doc1", "doc2"))
    assert(t.listIds("a") == Seq("doc2"))
    assert(t.listIds("b") == Seq("doc2"))
    assert(!t.contains("b", "doc1"))
    // re-insert on the grandchild un-masks locally only
    t.upsert("b", Seq(("doc1", Array(7f, 7f))).toDF("id", "vector"))
    assert(t.contains("b", "doc1") && !t.contains("a", "doc1"))
  }

  test("diff classifies added/modified/deleted vs the target's visible state") {
    val t = tree
    t.upsert("main", Seq(("doc2", Array(2f, 2f))).toDF("id", "vector"))
    t.createBranch("exp", "main")
    t.upsert("exp", Seq(("doc1", Array(8f, 8f)), // exists in main → modified
      ("doc9", Array(1f, 1f))).toDF("id", "vector")) // new → added
    t.delete("exp", Seq("doc2")) // exists in main → deleted
    val d = t.diff("exp", "main").as[(String, String)].collect().toSeq
    assert(d == Seq(("doc1", "modified"), ("doc2", "deleted"), ("doc9", "added")))
  }

  test("merge conflict strategies (collection_branch.rs:379-466)") {
    def conflicted = {
      val t = tree
      t.createBranch("x", "main"); t.createBranch("y", "main")
      t.upsert("x", Seq(("doc1", Array(10f, 0f))).toDF("id", "vector"))
      t.upsert("y", Seq(("doc1", Array(0f, 10f)),
        ("doc3", Array(3f, 3f))).toDF("id", "vector"))
      t
    }
    // SourceWins: conflict applied from source
    val t1 = conflicted
    val r1 = t1.merge("y", "x", MergeStrategy.SourceWins)
    assert(r1.conflicts == 1 && r1.conflictIds == Seq("doc1") && r1.merged == 2)
    assert(t1.get("x", "doc1").get.getSeq[Float](1) == Seq(0f, 10f))
    // TargetWins: conflict kept from target, non-conflicts merged
    val t2 = conflicted
    val r2 = t2.merge("y", "x", MergeStrategy.TargetWins)
    assert(r2.conflicts == 1 && r2.skipped == 1 && r2.merged == 1)
    assert(t2.get("x", "doc1").get.getSeq[Float](1) == Seq(10f, 0f))
    assert(t2.contains("x", "doc3"))
    // merging into itself is refused
    assertThrows[BranchError](conflicted.merge("x", "x"))
  }

  test("12-deep branch chain resolves correctly (plan growth stays linear)") {
    val t = new BranchTree(
      Seq(("k", Array(0f, 0f))).toDF("id", "vector"))
    var parent = "main"
    (1 to 12).foreach { i =>
      val b = s"b$i"
      t.createBranch(b, parent)
      // each level overrides k and adds its own id
      t.upsert(b, Seq(("k", Array(i.toFloat, 0f)),
        (s"n$i", Array(0f, i.toFloat))).toDF("id", "vector"))
      parent = b
    }
    val t0 = System.nanoTime()
    val resolved = t.resolve("b12")
    val ids = resolved.select("id").as[String].collect().toSet
    val secs = (System.nanoTime() - t0) / 1e9
    assert(ids == (1 to 12).map(i => s"n$i").toSet + "k")
    // deepest override wins through the whole chain
    assert(t.get("b12", "k").get.getSeq[Float](1) == Seq(12f, 0f))
    // the 25-join plan must analyze+execute in bounded time
    assert(secs < 60, s"deep-chain resolve took ${secs}s")
  }

  test("freeze, protected deletes, unknown branches") {
    val t = tree
    t.createBranch("f", "main").freeze("f")
    assertThrows[BranchError](
      t.upsert("f", Seq(("z", Array(0f, 0f))).toDF("id", "vector")))
    assertThrows[BranchError](t.deleteBranch("main"))
    t.createBranch("child", "f")
    assertThrows[BranchError](t.deleteBranch("f")) // has children
    t.deleteBranch("child")
    t.deleteBranch("f") // now deletable
    assertThrows[BranchError](t.resolve("nope"))
    val infos = t.listBranches.map(b => b.name -> b.parent).toMap
    assert(infos == Map("main" -> None))
  }
}
