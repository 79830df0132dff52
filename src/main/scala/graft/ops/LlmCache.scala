package graft.ops

import scala.collection.mutable

/** Semantic LLM response cache (reference: src/experimental/llm_cache.rs)
  * — exact-match-first, semantic-fallback caching of (query, embedding,
  * response) with TTL, LRU eviction, and cost-savings accounting.
  *
  * Session-scoped driver state, like [[QueryCache]] (a cache that lived in
  * the executors would not be a cache — lookups are per-query driver
  * decisions that gate whether a distributed job runs at all). The clock
  * is injectable so TTL behavior is deterministic under test.
  *
  * Semantics pinned to the reference:
  *   - normalization: lowercase, trim, whitespace-collapse
  *     (llm_cache.rs:233-243), applied to keys on put and exact get.
  *   - put on an existing key updates in place and refreshes created_at
  *     (:247-276); new keys LRU-evict at capacity (:447-459 — eviction by
  *     INSERTION order per the reference's push-only lru_order queue).
  *   - get_semantic tries exact first, then the best cosine match ≥
  *     threshold among unexpired entries (:342-420).
  *   - stats: hits/misses/exact/semantic split, expirations, evictions,
  *     cost_savings = hits · cost_per_query, avg semantic similarity
  *     (:503-541).
  */
final class LlmCache(maxEntries: Int = 10000,
                     similarityThreshold: Double = 0.95,
                     ttlSeconds: Long = 3600L,
                     normalizeQueries: Boolean = true,
                     costPerQuery: Double = 0.001,
                     clock: () => Long = () => System.currentTimeMillis() / 1000) {

  final case class Hit(response: String, cachedQuery: String,
                       similarity: Double, ageSeconds: Long)
  final case class Stats(totalQueries: Long, hits: Long, misses: Long,
                         exactMatches: Long, semanticMatches: Long,
                         size: Int, evictions: Long, expirations: Long,
                         costSavings: Double, hitRate: Double,
                         avgSemanticSimilarity: Double)

  private final case class Entry(var embedding: Array[Float],
                                 var response: String, var createdAt: Long,
                                 var accessCount: Long)

  private val entries = mutable.LinkedHashMap[String, Entry]()
  private var nTotal = 0L; private var nHit = 0L; private var nMiss = 0L
  private var nExact = 0L; private var nSemantic = 0L
  private var nEvict = 0L; private var nExpire = 0L
  private var semSimSum = 0.0

  private def normalize(q: String): String =
    if (!normalizeQueries) q
    else q.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+").mkString(" ")

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  private def expired(e: Entry, now: Long): Boolean = now - e.createdAt > ttlSeconds

  def put(query: String, embedding: Array[Float], response: String): Unit =
    synchronized {
      val key = normalize(query)
      entries.get(key) match {
        case Some(e) =>
          e.embedding = embedding; e.response = response
          e.createdAt = clock(); e.accessCount = 0
        case None =>
          if (entries.size >= maxEntries) {
            entries.headOption.foreach { case (k, _) =>
              entries.remove(k); nEvict += 1
            }
          }
          entries.put(key, Entry(embedding, response, clock(), 0))
      }
    }

  private def exactInternal(query: String, now: Long): Option[Hit] = {
    val key = normalize(query)
    entries.get(key) match {
      case Some(e) if !expired(e, now) =>
        e.accessCount += 1; nHit += 1; nExact += 1
        Some(Hit(e.response, key, 1.0, now - e.createdAt))
      case _ => None
    }
  }

  /** Exact lookup; expired entries are removed and count as a miss
    * (llm_cache.rs:299-339).
    */
  def getExact(query: String): Option[Hit] = synchronized {
    nTotal += 1
    val now = clock()
    val key = normalize(query)
    entries.get(key) match {
      case Some(e) if expired(e, now) =>
        entries.remove(key); nExpire += 1; nMiss += 1; None
      case _ =>
        val hit = exactInternal(query, now)
        if (hit.isEmpty) nMiss += 1
        hit
    }
  }

  /** Exact first, then best unexpired cosine match ≥ threshold
    * (llm_cache.rs:342-420).
    */
  def getSemantic(query: String, embedding: Array[Float]): Option[Hit] =
    synchronized {
      nTotal += 1
      val now = clock()
      exactInternal(query, now) match {
        case some @ Some(_) => some
        case None =>
          var bestKey: String = null; var bestSim = 0.0; var best: Entry = null
          entries.foreach { case (k, e) =>
            if (!expired(e, now)) {
              val sim = cosine(embedding, e.embedding)
              if (sim >= similarityThreshold && (best == null || sim > bestSim)) {
                bestKey = k; bestSim = sim; best = e
              }
            }
          }
          if (best != null) {
            best.accessCount += 1; nHit += 1; nSemantic += 1
            semSimSum += bestSim
            Some(Hit(best.response, bestKey, bestSim, now - best.createdAt))
          } else { nMiss += 1; None }
      }
    }

  /** Drop every expired entry, returning the count (llm_cache.rs:478-500). */
  def clearExpired(): Int = synchronized {
    val now = clock()
    val dead = entries.collect { case (k, e) if expired(e, now) => k }.toSeq
    dead.foreach(entries.remove)
    nExpire += dead.size
    dead.size
  }

  def size: Int = synchronized(entries.size)
  def cachedQueries: Seq[String] = synchronized(entries.keys.toSeq)
  def clear(): Unit = synchronized(entries.clear())

  def stats: Stats = synchronized {
    Stats(nTotal, nHit, nMiss, nExact, nSemantic, entries.size, nEvict,
      nExpire, nHit * costPerQuery,
      if (nTotal > 0) nHit.toDouble / nTotal else 0.0,
      if (nSemantic > 0) semSimSum / nSemantic else 0.0)
  }
}
