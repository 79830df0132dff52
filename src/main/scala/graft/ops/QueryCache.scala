package graft.ops

import scala.collection.mutable

/** Query result caches (reference: exact LRU `src/collection/cache.rs`,
  * similarity-keyed `src/search/semantic_cache.rs`).
  *
  * SURVEY.md marked these "non-semantic — skip", which is true of their
  * multi-tier plumbing (L1/L2 promotion, TTL eviction). The OBSERVABLE
  * semantics, though, are small and worth parity: an exact cache keyed on
  * (query, k, filter) and a semantic cache that answers a NEW query with a
  * CACHED query's results when cosine similarity ≥ threshold (default
  * 0.92, semantic_cache.rs:146). Both are driver-side memo structures —
  * they cache materialized top-k rows, never DataFrames, so nothing here
  * interferes with Spark's own caching.
  */
object QueryCache {

  final case class Stats(hits: Long, misses: Long, entries: Int) {
    def hitRate: Double =
      if (hits + misses == 0) 0.0 else hits.toDouble / (hits + misses)
  }

  /** Exact LRU over an opaque key (collection/cache.rs). */
  final class Lru[K, V](capacity: Int) {
    private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
      override protected def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        size() > capacity
    }
    private var h = 0L; private var mi = 0L
    def get(k: K): Option[V] = Option(m.get(k)) match {
      case some @ Some(_) => h += 1; some
      case None           => mi += 1; None
    }
    def put(k: K, v: V): Unit = m.put(k, v)
    def clear(): Unit = { m.clear(); h = 0; mi = 0 }
    def stats: Stats = Stats(h, mi, m.size())
  }

  /** Similarity-keyed cache: lookup scans the cached query vectors for the
    * best cosine similarity and hits when ≥ threshold
    * (semantic_cache.rs:254-320). Bounded; eviction is
    * least-recently-stored. Entry count is small (it memoizes QUERIES, not
    * data), so the linear scan is the honest structure — the reference's
    * HNSW tier is an optimization for thousands of cached queries.
    */
  final class Semantic[V](similarityThreshold: Double = 0.92,
                          capacity: Int = 1000) {
    private val entries = mutable.ArrayDeque[(Array[Float], V)]()
    private var h = 0L; private var mi = 0L

    private def cosineSim(a: Array[Float], b: Array[Float]): Double = {
      if (a.length != b.length) return -1.0
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) -1.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    def lookup(query: Array[Float]): Option[V] = {
      var best = -1.0; var bestV: Option[V] = None
      entries.foreach { case (qv, v) =>
        val s = cosineSim(query, qv)
        if (s > best) { best = s; bestV = Some(v) }
      }
      if (best >= similarityThreshold) { h += 1; bestV }
      else { mi += 1; None }
    }

    def store(query: Array[Float], value: V): Unit = {
      if (entries.size >= capacity) entries.removeHead()
      entries.append((query.clone(), value))
    }

    def clear(): Unit = { entries.clear(); h = 0; mi = 0 }
    def stats: Stats = Stats(h, mi, entries.size)

    /** Pre-populate from known queries (warm_semantic_cache). */
    def warm(qs: Seq[(Array[Float], V)]): Unit = qs.foreach((store _).tupled)
  }
}
