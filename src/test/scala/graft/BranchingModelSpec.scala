package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.ops.Branching._

/** Model-based property test for the COW branch tree (the
  * TransactionsModelSpec pattern): random create/delete/upsert/delete/
  * freeze/diff/merge sequences over a small id pool replayed against an
  * in-memory layer model with the reference semantics
  * (collection_branch.rs: last change per id wins within a layer,
  * resolve folds the LIVE ancestry root→branch so later parent changes
  * are visible to children, diff compares the source's LOCAL layer to
  * the target's visible state, a merge conflict is an id changed in
  * BOTH local layers, frozen branches refuse mutation and merge-into).
  * After every step the resolved state of every live branch must equal
  * the model's, and diff/merge results must match exactly.
  */
class BranchingModelSpec extends SparkSpec {
  import spark.implicits._

  // a change is Some(payload) for upsert, None for a delete tombstone
  private final case class MLayer(parent: Option[String],
    changes: mutable.LinkedHashMap[String, Option[(Int, String)]],
    var frozen: Boolean = false)

  private type Payload = (Int, String)

  for (seed <- Seq(7, 4242))
    test(s"40 random branch/mutate/diff/merge steps match the layer " +
        s"model (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val ids = (0 until 8).map(i => s"d$i")

      val seedRows = Seq(("d0", 0, "s0"), ("d1", 1, "s1"), ("d2", 2, "s2"))
      val tree = new BranchTree(seedRows.toDF("id", "v", "s"))
      val model = mutable.LinkedHashMap[String, MLayer](
        "main" -> MLayer(None, mutable.LinkedHashMap(
          seedRows.map(r => r._1 -> Some((r._2, r._3))): _*)))

      def mAncestry(name: String): Seq[MLayer] = {
        var chain = List(model(name))
        while (chain.head.parent.isDefined)
          chain = model(chain.head.parent.get) :: chain
        chain
      }

      def mResolve(name: String): Map[String, Payload] =
        mAncestry(name).foldLeft(Map.empty[String, Payload]) { (st, l) =>
          l.changes.foldLeft(st) {
            case (s, (id, Some(p))) => s + (id -> p)
            case (s, (id, None))    => s - id
          }
        }

      def mDiff(source: String, target: String): Map[String, String] = {
        val tgt = mResolve(target).keySet
        model(source).changes.flatMap {
          case (id, Some(_)) =>
            Some(id -> (if (tgt.contains(id)) "modified" else "added"))
          case (id, None) =>
            if (tgt.contains(id)) Some(id -> "deleted") else None
        }.toMap
      }

      def liveBranches: Seq[String] = model.keys.toSeq

      def checkAll(): Unit = liveBranches.foreach { b =>
        val got = tree.resolve(b).collect()
          .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap
        assert(got == mResolve(b), s"branch '$b' diverged from model")
        // layer compaction: one stored change per id
        assert(tree.branchInfo(b).get.changeCount ==
          model(b).changes.size.toLong, s"layer size of '$b'")
      }

      def randomPayloadRows(n: Int): Seq[(String, Int, String)] =
        (0 until n).map { _ =>
          (ids(rnd.nextInt(ids.size)), rnd.nextInt(100),
            s"s${rnd.nextInt(10)}")
        }

      var merges = 0
      var conflictsSeen = 0
      var frozenRejections = 0
      (1 to 40).foreach { step =>
        rnd.nextInt(10) match {
          case 0 => // create a branch off a random live parent
            val name = s"b$step"
            val parent = liveBranches(rnd.nextInt(liveBranches.size))
            tree.createBranch(name, parent)
            model(name) = MLayer(Some(parent), mutable.LinkedHashMap.empty)
          case 1 => // delete a random branch — guards must agree
            val name = liveBranches(rnd.nextInt(liveBranches.size))
            val hasChildren = model.values.exists(_.parent.contains(name))
            if (name == "main" || hasChildren)
              intercept[BranchError](tree.deleteBranch(name))
            else { tree.deleteBranch(name); model.remove(name); () }
          case 2 | 3 | 4 => // upsert a batch (duplicate ids in a batch ok)
            val name = liveBranches(rnd.nextInt(liveBranches.size))
            val rows = randomPayloadRows(1 + rnd.nextInt(3))
            if (model(name).frozen) {
              frozenRejections += 1
              intercept[BranchError](
                tree.upsert(name, rows.toDF("id", "v", "s")))
            } else {
              tree.upsert(name, rows.toDF("id", "v", "s"))
              rows.foreach { case (id, v, s) =>
                model(name).changes(id) = Some((v, s))
              }
            }
          case 5 => // tombstone ids (present or not)
            val name = liveBranches(rnd.nextInt(liveBranches.size))
            val victims = Seq.fill(1 + rnd.nextInt(2))(
              ids(rnd.nextInt(ids.size))).distinct
            if (model(name).frozen) {
              frozenRejections += 1
              intercept[BranchError](tree.delete(name, victims))
            } else {
              tree.delete(name, victims)
              victims.foreach(id => model(name).changes(id) = None)
            }
          case 6 => // freeze a non-main branch (sparingly: leafs only)
            val leafs = liveBranches.filter(b => b != "main" &&
              !model.values.exists(_.parent.contains(b)))
            if (leafs.nonEmpty) {
              val name = leafs(rnd.nextInt(leafs.size))
              tree.freeze(name)
              model(name).frozen = true
            }
          case 7 => // diff two random branches
            val s = liveBranches(rnd.nextInt(liveBranches.size))
            val t = liveBranches(rnd.nextInt(liveBranches.size))
            val got = tree.diff(s, t).collect()
              .map(r => r.getString(0) -> r.getString(1)).toMap
            assert(got == mDiff(s, t), s"diff($s, $t) diverged")
          case 8 | 9 => // merge with a random strategy
            val s = liveBranches(rnd.nextInt(liveBranches.size))
            // prefer a distinct target (the self-merge guard is still
            // exercised when only one branch is alive)
            val others = liveBranches.filterNot(_ == s)
            val t = if (others.isEmpty) s
                    else others(rnd.nextInt(others.size))
            if (s == t)
              intercept[BranchError](tree.merge(s, t))
            else if (model(t).frozen) {
              frozenRejections += 1
              intercept[BranchError](tree.merge(s, t))
            } else {
              merges += 1
              val strategy = rnd.nextInt(3) match {
                case 0 => MergeStrategy.SourceWins
                case 1 => MergeStrategy.TargetWins
                case _ => MergeStrategy.Skip
              }
              val conflicts = model(s).changes.keySet
                .intersect(model(t).changes.keySet).toSeq.sorted
              conflictsSeen += conflicts.size
              val applied = strategy match {
                case MergeStrategy.SourceWins => model(s).changes.toSeq
                case _ => model(s).changes.toSeq
                  .filterNot(c => conflicts.contains(c._1))
              }
              val r = tree.merge(s, t, strategy)
              assert(r.merged == applied.size.toLong)
              assert(r.conflicts == conflicts.size.toLong)
              assert(r.conflictIds == conflicts)
              assert(r.skipped == (strategy match {
                case MergeStrategy.SourceWins => 0L
                case _ => conflicts.size.toLong
              }))
              applied.foreach { case (id, c) => model(t).changes(id) = c }
            }
        }
        checkAll()
      }
      // the sequence must have exercised the interesting paths
      assert(liveBranches.size >= 2 && merges >= 3)
      assert(conflictsSeen + frozenRejections > 0)
    }

  test("upsert ordering contract: locally built batches compact in " +
      "logical row order; a multi-partition shuffled batch compacts " +
      "deterministically across runs") {
    val seedRows = Seq(("d0", 0, "s0"))
    // (a) locally built duplicate-id batch: LAST logical row wins, exactly
    // like the reference's document-order HashMap loop
    val local = new BranchTree(seedRows.toDF("id", "v", "s"))
    local.upsert("main", Seq(
      ("d1", 1, "first"), ("d2", 2, "x"), ("d1", 3, "second"),
      ("d1", 4, "third")).toDF("id", "v", "s"))
    val got = local.resolve("main").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(got("d1") == ((4, "third")), s"logical last must win: $got")
    assert(local.branchInfo("main").get.changeCount == 3L) // seed d0 + d1 + d2

    // (b) a batch that went through a shuffle has no logical row order;
    // the contract is a DETERMINISTIC physical-order winner: the same
    // repartitioned batch upserted into two fresh trees resolves
    // identically, with one layer row per id
    def shuffledBatch = (0 until 40)
      .map(i => (s"d${i % 5}", i, s"s$i")).toDF("id", "v", "s")
      .repartition(4)
    def runOnce(): Map[String, (Int, String)] = {
      val t = new BranchTree(seedRows.toDF("id", "v", "s"))
      t.upsert("main", shuffledBatch)
      assert(t.branchInfo("main").get.changeCount == 5L) // one row per d0..d4
      t.resolve("main").collect()
        .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap
    }
    val a = runOnce()
    val b = runOnce()
    assert(a == b, s"shuffled-batch winner must be run-stable:\n$a\n$b")
    assert(a.keySet == Set("d0", "d1", "d2", "d3", "d4"))
  }
}
