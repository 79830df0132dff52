package graft

import graft.ops.QueryCache

class QueryCacheSpec extends SparkSpec {

  test("LRU: capacity eviction is least-recently-used; stats track hit rate") {
    val c = new QueryCache.Lru[String, Int](2)
    c.put("a", 1); c.put("b", 2)
    assert(c.get("a").contains(1)) // touches a — b is now eldest
    c.put("c", 3)                  // evicts b
    assert(c.get("b").isEmpty)
    assert(c.get("a").contains(1) && c.get("c").contains(3))
    val s = c.stats
    assert(s.entries == 2 && s.hits == 3 && s.misses == 1)
    assert(math.abs(s.hitRate - 0.75) < 1e-9)
  }

  test("semantic cache: near-identical query hits, dissimilar misses (threshold 0.92)") {
    val c = new QueryCache.Semantic[String]()
    c.store(Array(1f, 0f, 0f), "cached-result")
    // tiny perturbation → cosine ≈ 0.995 → hit
    assert(c.lookup(Array(0.995f, 0.1f, 0f)).contains("cached-result"))
    // orthogonal → miss
    assert(c.lookup(Array(0f, 1f, 0f)).isEmpty)
    // dimension mismatch can never hit
    assert(c.lookup(Array(1f, 0f)).isEmpty)
    val s = c.stats
    assert(s.hits == 1 && s.misses == 2 && s.entries == 1)
  }

  test("semantic cache: best entry wins; capacity evicts oldest; warm pre-populates") {
    val c = new QueryCache.Semantic[String](similarityThreshold = 0.9, capacity = 2)
    c.warm(Seq(
      Array(1f, 0f) -> "x-axis",
      Array(0f, 1f) -> "y-axis"))
    assert(c.lookup(Array(0.9f, 0.1f)).contains("x-axis"))
    assert(c.lookup(Array(0.1f, 0.9f)).contains("y-axis"))
    c.store(Array(1f, 1f), "diag") // capacity 2 → evicts oldest (x-axis)
    assert(c.lookup(Array(1f, 0f)).isEmpty)
    assert(c.lookup(Array(0.05f, 1f)).contains("y-axis"))
  }

  test("materialized view staleness-triggered refresh") {
    import spark.implicits._
    val s = new graft.needleql.NeedleSession(spark)
    s.register("docs", graft.needleql.CollectionDef(
      Seq(("a", Array(1f, 0f), 1.0)).toDF("id", "vector", "score")))
    s.sql("CREATE MATERIALIZED VIEW top AS SELECT id FROM docs ORDER BY score DESC LIMIT 5")
    val refreshedAt = s.views("top").refreshedAtMs
    // fresh → no refresh; stale → refresh runs and bumps the stamp
    assert(!s.refreshViewIfStale("top", maxAgeMs = 60000, nowMs = refreshedAt + 1000))
    assert(s.refreshViewIfStale("top", maxAgeMs = 500, nowMs = refreshedAt + 1000))
    assert(s.views("top").refreshedAtMs >= refreshedAt)
  }
}
