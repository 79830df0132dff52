package graft

import org.apache.spark.sql.functions._

import graft.ops.CollaborativeFiltering
import graft.ops.CollaborativeFiltering._

class CollaborativeFilteringSpec extends SparkSpec {
  import spark.implicits._

  test("interaction weights match the reference table (collaborative_filtering.rs:42)") {
    val got = Seq(
      ("click", null.asInstanceOf[java.lang.Double]),
      ("purchase", null.asInstanceOf[java.lang.Double]),
      ("rating", java.lang.Double.valueOf(4.0)),
      ("search_result", null.asInstanceOf[java.lang.Double]),
      ("custom", java.lang.Double.valueOf(2.5)))
      .toDF("t", "r")
      .select(interactionWeight(col("t"), col("r"))).as[Double].collect().toSeq
    assert(got == Seq(1.0, 5.0, 4.0, 0.5, 2.5))
  }

  // two disjoint taste groups: users 0-4 interact with items a0-a4,
  // users 5-9 with items b0-b4; one cross interaction to connect the graph
  private def model = {
    val interactions = (for {
      u <- 0 until 5; i <- 0 until 5 if (u + i) % 5 != 4
    } yield (s"ua$u", s"a$i", 3.0)) ++ (for {
      u <- 0 until 5; i <- 0 until 5 if (u + i) % 5 != 4
    } yield (s"ub$u", s"b$i", 3.0))
    CollaborativeFiltering.fit(
      interactions.toDF("user", "item", "w"), "user", "item", "w",
      rank = 4, maxIter = 10)
  }

  test("ALS recommendations stay within the user's taste group") {
    val m = model
    // ua0 interacted with a0..a3 (skipping (0+4)%5==4 -> a4 unseen):
    // the held-out item from the SAME group must outrank every b item
    val recs = CollaborativeFiltering
      .recommend(m, "ua0", k = 1, seen = Seq("a0", "a1", "a2", "a3"))
      .select("item").as[String].collect()
    assert(recs.head == "a4", recs.mkString(","))
    val recsB = CollaborativeFiltering
      .recommend(m, "ub2", k = 1, seen = Seq("b0", "b1", "b3", "b4"))
      .select("item").as[String].collect()
    assert(recsB.head == "b2", recsB.mkString(","))
  }

  test("session recommendations follow the recent items' group") {
    val m = model
    val recs = CollaborativeFiltering
      .recommendSession(m, recentItems = Seq("a0", "a1"), k = 3)
      .select("item").as[String].collect().toSeq
    // nearest non-recent items by factor centroid are the other a's
    assert(recs.forall(_.startsWith("a")), recs.mkString(","))
  }

  test("denseIndex assigns the same ids as the single-partition window " +
      "form (r14: fit's numbering delegates to DistributedRank)") {
    import org.apache.spark.sql.expressions.Window
    val base = spark.range(5000)
      .select(concat(lit("u"), pmod(col("id") * 48271L, lit(5000)))
        .as("u")).distinct().repartition(8)
    val (mapping, release) = CollaborativeFiltering.denseIndex(base, "u", "uid")
    val scalable = mapping.select("u", "uid").localCheckpoint(true)
    release()
    val oracle = base.withColumn("uid",
      (row_number().over(Window.orderBy(col("u"))) - 1).cast("int"))
      .select("u", "uid")
    assert(scalable.except(oracle).count() == 0)
    assert(oracle.except(scalable).count() == 0)
    // dense and 0-based: ids form exactly 0..n-1
    val n = base.count()
    assert(scalable.agg(max("uid")).head().getInt(0) == n - 1)
    assert(scalable.select("uid").distinct().count() == n)
  }

  test("hybrid blends CF with content similarity") {
    val m = model
    // content vectors: b0 is exactly the query direction; alpha=0 makes
    // content dominate, alpha=1 restores pure CF
    val vecs = ((0 until 5).map(i => (s"a$i", Array(1f, 0f))) ++
      (0 until 5).map(i => (s"b$i", Array(0f, 1f)))).toDF("id", "v")
    val q = Array(0f, 1f)
    val contentFirst = CollaborativeFiltering.recommendHybrid(
      m, "ua0", vecs, "id", "v", q, k = 1, alpha = 0.0)
      .select("item").as[String].head()
    assert(contentFirst.startsWith("b"), contentFirst) // query points at b-space
    val cfFirst = CollaborativeFiltering.recommendHybrid(
      m, "ua0", vecs, "id", "v", q, k = 1, alpha = 1.0)
      .select("item").as[String].head()
    assert(cfFirst.startsWith("a"), cfFirst) // CF keeps the taste group
  }
}
