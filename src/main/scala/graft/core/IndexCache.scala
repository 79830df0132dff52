package graft.core

/** Session-lifetime memo for derived index structures (IVF centroids, BM25
  * stats tables). The reference treats these as persistent collection
  * state maintained across queries (hybrid.rs keeps the Bm25Index, ivf.rs
  * keeps the cell lists); rebuilding them per query would misrepresent both
  * the semantics and the cost model. Keys are caller-chosen strings that
  * must capture every build parameter (source dir, cell count, config).
  */
object IndexCache {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, Any]()

  def getOrBuild[T](key: String)(build: => T): T =
    m.computeIfAbsent(key, _ => build).asInstanceOf[T]

  def invalidate(key: String): Unit = m.remove(key)
  def clear(): Unit = m.clear()
}
