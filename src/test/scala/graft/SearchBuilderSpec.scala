package graft

import org.apache.spark.sql.functions._

import graft.ops.{SearchBuilder, TimeDecay}

/** Stage-order behavior tests for the search pipeline (reference:
  * src/collection/pipeline.rs:414-447).
  */
class SearchBuilderSpec extends SparkSpec {
  import spark.implicits._

  // 6 vectors on a line: distance to query (1,0) is ordered by id.
  private lazy val coll = Seq(
    (1L, Array(1.00f, 0.00f), "a", 100L, null.asInstanceOf[java.lang.Long]),
    (2L, Array(0.99f, 0.10f), "b", 200L, null.asInstanceOf[java.lang.Long]),
    (3L, Array(0.90f, 0.30f), "a", 300L, null.asInstanceOf[java.lang.Long]),
    (4L, Array(0.80f, 0.60f), "b", 400L, java.lang.Long.valueOf(50L)), // expired
    (5L, Array(0.50f, 0.86f), "a", 500L, null.asInstanceOf[java.lang.Long]),
    (6L, Array(0.00f, 1.00f), "b", 9000L, null.asInstanceOf[java.lang.Long]),
  ).toDF("id", "vec", "cat", "inserted_at", "ttl")

  private def base = SearchBuilder(
    df = coll, query = lit(Array(1.0f, 0.0f)), vecCol = col("vec"),
    idCol = col("id"), insertedAtCol = Some(col("inserted_at")),
    ttlExpiresAtCol = Some(col("ttl")), nowEpochS = Some(1000L))

  private def ids(b: SearchBuilder): Seq[Long] =
    b.execute().select("id").as[Long].collect().toSeq

  test("ttl-expired rows are lazily filtered") {
    assert(ids(base.withK(10)) == Seq(1L, 2L, 3L, 5L, 6L))
  }

  test("as_of excludes later insertions") {
    assert(ids(base.withK(10).withAsOf(300L)) == Seq(1L, 2L, 3L))
  }

  test("pre-filter restricts candidates") {
    assert(ids(base.withK(10).withFilter("""{"cat": "a"}""")) == Seq(1L, 3L, 5L))
  }

  test("post-filter over-fetches k*factor then truncates to k") {
    // k=1, factor=3: fetch top-3 (1,2,3), post-filter cat=b keeps 2
    assert(ids(base.withK(1).withPostFilter("""{"cat": "b"}""")) == Seq(2L))
    // factor=1: fetch only top-1 (id 1, cat a) -> post-filter kills it
    assert(ids(base.withK(1).copy(
      postFilter = Some(graft.filter.Filter.parse("""{"cat": "b"}""")),
      postFilterFactor = 1)) == Seq())
  }

  test("time decay re-ranks only within the truncated top-k") {
    // k=2: top-2 by distance = (1, 2); decay (linear, max_age 1000) makes
    // older vectors worse: age(1)=900 -> f=0.1, age(2)=800 -> f=0.2.
    // id1: d=0 -> 0/0.1=0 stays first. Use dot metric for nonzero d1.
    val got = base.withK(2).withMetric("euclidean")
      .withTimeDecay(TimeDecay.Linear(1000L)).execute()
      .select("id").as[Long].collect().toSeq
    // d1=0/0.1=0; d2=0.1414/0.2=0.707 -> order (1,2); id6 (young) never
    // considered because truncation happens before decay.
    assert(got == Seq(1L, 2L))
  }

  test("zero decay factor pins distance to f32::MAX but keeps the row") {
    val got = base.withK(3).withMaxAge(100L).execute()
      .select("id", "distance").as[(Long, Double)].collect().toMap
    // ages: id1=900, id2=800, id3=700 all > 100 -> every distance = f32MAX
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(_ == Float.MaxValue.toDouble))
  }

  test("step decay window is inclusive; young rows keep distances") {
    val got = base.withK(5).withMaxAge(600L).execute()
      .select("id", "distance").as[(Long, Double)].collect().toMap
    // ages: id1=900, id2=800, id3=700 (outside window -> f32::MAX);
    // id5=500, id6=0 (greatest(now-ts, 0)) stay intact
    assert(got(1L) == Float.MaxValue.toDouble)
    assert(got(5L) < 1.1 && got(6L) < 1.1)
    // inclusive boundary: window 900 keeps id1 untouched
    val inc = base.withK(1).withMaxAge(900L).execute()
      .select("distance").as[Double].head()
    assert(inc == 0.0)
  }
}
