package graft

import scala.collection.mutable

import graft.ops.LlmCache

/** Model-based property test for the LLM cache (the
  * TransactionsModelSpec pattern): 250 seeded random
  * put/getExact/getSemantic/tick/clearExpired steps at capacity 3 and
  * a 10-second TTL, replayed against a LinkedHashMap model of the
  * reference semantics (llm_cache.rs): normalized keys; put on an
  * existing key updates IN PLACE (keeps its insertion position,
  * refreshes TTL, resets accessCount); new keys evict the
  * insertion-order head at capacity; getExact REMOVES an expired key
  * and counts an expiration, while getSemantic leaves expired entries
  * in place and merely skips them — the asymmetry is part of the pin.
  * Entry order, per-entry fields, and every stats counter (including
  * the semantic-similarity running average) are compared after each
  * step.
  */
class LlmCacheModelSpec extends SparkSpec {

  private final case class MEntry(var emb: Array[Float], var resp: String,
                                  var createdAt: Long, var accessCount: Long)

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  test("250 random cache ops match the LRU/TTL model, counters included") {
    val rnd = new scala.util.Random(20260813)
    val maxEntries = 3
    val ttl = 10L
    val threshold = 0.95
    var clock = 100L
    val cache = new LlmCache(maxEntries = maxEntries,
      similarityThreshold = threshold, ttlSeconds = ttl,
      costPerQuery = 0.001, clock = () => clock)

    // queries normalize to a small hot key space; embeddings are unit
    // vectors at fixed angles so near-threshold cosines actually occur
    val rawQueries = Vector("what is spark", "What  is Spark", "  WHAT IS SPARK ",
      "define shuffle", "Define Shuffle", "broadcast join", "skew salting",
      "aqe replan", "catalyst rule", "codegen stage")
    def normalize(q: String): String =
      q.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").mkString(" ")
    def emb(i: Int): Array[Float] = {
      val t = i * 0.1
      Array(math.cos(t).toFloat, math.sin(t).toFloat)
    }

    val model = mutable.LinkedHashMap.empty[String, MEntry]
    var mTotal = 0L; var mHit = 0L; var mMiss = 0L
    var mExact = 0L; var mSemantic = 0L
    var mEvict = 0L; var mExpire = 0L; var mSemSum = 0.0

    def mExpired(e: MEntry): Boolean = clock - e.createdAt > ttl

    def mExactInternal(key: String): Boolean =
      model.get(key) match {
        case Some(e) if !mExpired(e) =>
          e.accessCount += 1; mHit += 1; mExact += 1; true
        case _ => false
      }

    var semanticHits = 0
    var expiredRemovals = 0
    (1 to 250).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // put
          val q = rawQueries(rnd.nextInt(rawQueries.size))
          val e = emb(rnd.nextInt(8))
          val r = s"r${rnd.nextInt(50)}"
          cache.put(q, e, r)
          val key = normalize(q)
          model.get(key) match {
            case Some(m) =>
              m.emb = e; m.resp = r; m.createdAt = clock; m.accessCount = 0
            case None =>
              if (model.size >= maxEntries) {
                model.headOption.foreach { case (k, _) =>
                  model.remove(k); mEvict += 1
                }
              }
              model(key) = MEntry(e, r, clock, 0)
          }
        case 3 | 4 | 5 => // getExact (hit, miss, or expire-and-remove)
          val q = rawQueries(rnd.nextInt(rawQueries.size))
          val got = cache.getExact(q)
          mTotal += 1
          val key = normalize(q)
          model.get(key) match {
            case Some(e) if mExpired(e) =>
              expiredRemovals += 1
              model.remove(key); mExpire += 1; mMiss += 1
              assert(got.isEmpty)
            case Some(e) =>
              e.accessCount += 1; mHit += 1; mExact += 1
              assert(got.exists(h => h.response == e.resp &&
                h.similarity == 1.0 && h.ageSeconds == clock - e.createdAt))
            case None =>
              mMiss += 1; assert(got.isEmpty)
          }
        case 6 | 7 => // getSemantic (exact first; expired entries SKIPPED,
          // not removed)
          val q = rawQueries(rnd.nextInt(rawQueries.size))
          val qe = emb(rnd.nextInt(8))
          val got = cache.getSemantic(q, qe)
          mTotal += 1
          if (mExactInternal(normalize(q))) {
            assert(got.exists(_.similarity == 1.0))
          } else {
            var bestKey: String = null; var bestSim = 0.0
            var best: MEntry = null
            model.foreach { case (k, e) =>
              if (!mExpired(e)) {
                val sim = cosine(qe, e.emb)
                if (sim >= threshold && (best == null || sim > bestSim)) {
                  bestKey = k; bestSim = sim; best = e
                }
              }
            }
            if (best != null) {
              semanticHits += 1
              best.accessCount += 1; mHit += 1; mSemantic += 1
              mSemSum += bestSim
              assert(got.exists(h => h.cachedQuery == bestKey &&
                h.similarity == bestSim && h.response == best.resp))
            } else { mMiss += 1; assert(got.isEmpty) }
          }
        case 8 => // advance the clock (sometimes past the TTL)
          clock += Seq(1L, 3L, 12L)(rnd.nextInt(3))
        case 9 => // clearExpired
          val dead = model.collect {
            case (k, e) if mExpired(e) => k
          }.toSeq
          assert(cache.clearExpired() == dead.size)
          dead.foreach(model.remove)
          mExpire += dead.size
      }
      // full-state + counters comparison every step
      assert(cache.cachedQueries == model.keys.toSeq, "key order diverged")
      val st = cache.stats
      assert(st.size == model.size)
      assert((st.totalQueries, st.hits, st.misses, st.exactMatches,
        st.semanticMatches, st.evictions, st.expirations) ==
        ((mTotal, mHit, mMiss, mExact, mSemantic, mEvict, mExpire)))
      assert(st.costSavings == mHit * 0.001)
      assert(st.hitRate ==
        (if (mTotal > 0) mHit.toDouble / mTotal else 0.0))
      assert(st.avgSemanticSimilarity ==
        (if (mSemantic > 0) mSemSum / mSemantic else 0.0))
    }
    // the sequence must have exercised the interesting paths
    assert(mEvict >= 10 && semanticHits >= 5 && expiredRemovals >= 3)
  }
}
