package graft

import graft.ops.LlmCache

/** Semantic LLM response cache (reference: experimental/llm_cache.rs). */
class LlmCacheSpec extends SparkSpec {

  private def cacheAt(t0: Long, ttl: Long = 3600, max: Int = 10000,
                      thr: Double = 0.95): (LlmCache, () => Unit, Long => Unit) = {
    var now = t0
    val c = new LlmCache(maxEntries = max, similarityThreshold = thr,
      ttlSeconds = ttl, clock = () => now)
    (c, () => (), (d: Long) => now += d)
  }

  test("exact hit after normalization: case/whitespace-insensitive keys") {
    val (c, _, _) = cacheAt(0)
    c.put("What  is SPARK?", Array(1f, 0f), "a cluster engine")
    val hit = c.getExact("what is spark?")
    assert(hit.exists(h => h.response == "a cluster engine" && h.similarity == 1.0))
    assert(c.getExact("what is flink?").isEmpty)
    val s = c.stats
    assert(s.exactMatches == 1 && s.misses == 1 && s.totalQueries == 2)
  }

  test("semantic fallback picks the best match over threshold; records similarity") {
    val (c, _, _) = cacheAt(0)
    c.put("q1", Array(1f, 0f), "r1")
    c.put("q2", Array(0.9f, 0.1f), "r2")
    c.put("q3", Array(0f, 1f), "r3")
    val hit = c.getSemantic("unseen", Array(0.9f, 0.1f))
    assert(hit.exists(_.response == "r2"), "closest embedding wins")
    assert(c.getSemantic("unseen", Array(0.7f, 0.7f)).isEmpty,
      "below-threshold similarity is a miss")
    val s = c.stats
    assert(s.semanticMatches == 1 && s.avgSemanticSimilarity > 0.95)
  }

  test("TTL expires entries on read and via clearExpired") {
    val (c, _, tick) = cacheAt(0, ttl = 100)
    c.put("old", Array(1f, 0f), "r")
    tick(101)
    assert(c.getExact("old").isEmpty)
    assert(c.stats.expirations == 1 && c.size == 0)
    c.put("a", Array(1f, 0f), "r"); tick(101); c.put("b", Array(1f, 0f), "r")
    assert(c.clearExpired() == 1 && c.cachedQueries == Seq("b"))
    // expired entries are invisible to semantic lookup too
    tick(101)
    assert(c.getSemantic("x", Array(1f, 0f)).isEmpty)
  }

  test("put on an existing key updates in place and refreshes TTL") {
    val (c, _, tick) = cacheAt(0, ttl = 100)
    c.put("q", Array(1f, 0f), "v1")
    tick(90)
    c.put("q", Array(1f, 0f), "v2") // refresh
    tick(90)
    assert(c.getExact("q").exists(_.response == "v2"), "refreshed entry lives on")
    assert(c.size == 1)
  }

  test("capacity evicts the oldest insertion; cost savings accumulate") {
    val (c, _, _) = cacheAt(0, max = 2)
    c.put("a", Array(1f, 0f), "ra"); c.put("b", Array(0f, 1f), "rb")
    c.put("c", Array(1f, 1f), "rc")
    assert(c.size == 2 && c.getExact("a").isEmpty, "oldest insertion evicted")
    assert(c.getExact("b").isDefined && c.getExact("c").isDefined)
    val s = c.stats
    assert(s.evictions == 1)
    assert(math.abs(s.costSavings - 2 * 0.001) < 1e-12)
    assert(math.abs(s.hitRate - 2.0 / 3.0) < 1e-12)
  }
}
