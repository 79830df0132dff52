package graft.plugins

import java.net.{URL, URLClassLoader}
import java.nio.file.{Files, Path}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plugin system (reference: src/experimental/plugin.rs — Plugin trait
  * :171, typed subtraits :214-266, PluginManager :341-520,
  * dependency-ordered bulk registration :470; the WASM sandbox at :801 is
  * the reference's isolation mechanism).
  *
  * JVM re-expression: plugins are precompiled classes implementing
  * [[GraftPlugin]], discovered with `java.util.ServiceLoader` from an
  * ISOLATED `URLClassLoader` per plugin directory — the JVM's native
  * equivalent of the reference's sandboxed module loading (namespace
  * isolation; the JVM has no in-process syscall sandbox, so trust is
  * per-directory and documented, not pretended). Lifecycle (`onLoad` /
  * `onUnload` with restore-on-failure), duplicate rejection, and
  * dependency-ordered bulk registration reproduce PluginManager's
  * semantics exactly.
  *
  * Spark integration — what makes a plugin USABLE in queries at scale:
  *   - [[PluginManager.bindDistance]] registers a DistancePlugin as a
  *     session UDF `dist_<name>` (the plugin rides to executors inside the
  *     UDF closure, so implementations must be Serializable; ship the
  *     plugin jar with `spark.jars` on a cluster);
  *   - [[PluginManager.transformColumn]] applies an EmbeddingTransformer
  *     to an `ARRAY<FLOAT>` column the same way;
  *   - pre/post search hooks adapt onto [[graft.ops.Hooks]]' DataFrame →
  *     DataFrame chains via [[PluginManager.asSearchHook]].
  */
object PluginTypes {
  val Distance = "distance"
  val PreSearchHook = "pre_search_hook"
  val PostSearchHook = "post_search_hook"
  val EmbeddingTransformer = "embedding_transformer"
  val IndexBackend = "index_backend"
  val StorageBackend = "storage_backend"
  val Custom = "custom"
  val all: Set[String] = Set(Distance, PreSearchHook, PostSearchHook,
    EmbeddingTransformer, IndexBackend, StorageBackend, Custom)
}

/** Static metadata (plugin.rs:124-165). Kept Java-friendly — plugins are
  * routinely written in plain Java.
  */
final case class PluginManifest(name: String, version: String,
                                author: String, description: String,
                                pluginType: String,
                                dependencies: java.util.List[String]) {
  def deps: Seq[String] = dependencies.asScala.toSeq
}

/** Core plugin contract (plugin.rs:171-201). Pure-abstract so Java
  * implementations need no Scala runtime gymnastics.
  */
trait GraftPlugin {
  def manifest(): PluginManifest
  def onLoad(): Unit
  def onUnload(): Unit
}

/** Custom distance function (plugin.rs:214-222). */
trait DistancePlugin extends GraftPlugin with Serializable {
  def computeDistance(a: Array[Float], b: Array[Float]): Float
  def distanceName(): String
}

/** Query rewrite before search (plugin.rs:226-231): may modify the query
  * vector and/or k.
  */
trait PreSearchHookPlugin extends GraftPlugin {
  def beforeSearch(query: Array[Float], k: Int): (Array[Float], Int)
}

/** Result rewrite after search (plugin.rs:234-240): receives the bounded
  * result DataFrame (id, distance, …) and returns a modified one — the
  * DataFrame-native analogue of the reference's Vec<SearchHookResult>.
  */
trait PostSearchHookPlugin extends GraftPlugin {
  def afterSearch(results: DataFrame): DataFrame
}

/** Vector transformer (plugin.rs:243-266). */
trait EmbeddingTransformerPlugin extends GraftPlugin with Serializable {
  def transformForIndex(vector: Array[Float]): Array[Float]
  def transformForQuery(vector: Array[Float]): Array[Float] =
    transformForIndex(vector)
  def changesDimensions(): Boolean = false
  def outputDimensions(inputDimensions: Int): Int = inputDimensions
}

final class PluginException(msg: String) extends RuntimeException(msg)

/** Registry with the reference PluginManager's exact semantics
  * (plugin.rs:341-520): duplicate rejection, lifecycle calls, unregister
  * restore-on-failure, dependency-ordered bulk registration with cycle
  * detection.
  */
class PluginManager {

  private val plugins = mutable.LinkedHashMap.empty[String, GraftPlugin]

  def register(plugin: GraftPlugin): Unit = synchronized {
    val m = plugin.manifest()
    if (!PluginTypes.all.contains(m.pluginType))
      throw new PluginException(s"unknown plugin type: ${m.pluginType}")
    if (plugins.contains(m.name))
      throw new PluginException(s"plugin already registered: ${m.name}")
    val missing = m.deps.filterNot(plugins.contains)
    if (missing.nonEmpty)
      throw new PluginException(
        s"plugin ${m.name} missing dependencies: ${missing.mkString(", ")}")
    try plugin.onLoad()
    catch {
      case e: Exception =>
        throw new PluginException(s"on_load failed for '${m.name}': ${e.getMessage}")
    }
    plugins(m.name) = plugin
  }

  /** Bulk registration respecting manifest dependencies (plugin.rs:470):
    * topological order; a cycle or missing dependency fails the whole
    * batch before any onLoad runs.
    */
  def registerAll(batch: Seq[GraftPlugin]): Unit = synchronized {
    val byName = batch.map(p => p.manifest().name -> p).toMap
    val visiting = mutable.Set.empty[String]
    val ordered = mutable.LinkedHashSet.empty[String]
    def visit(n: String): Unit = {
      if (!ordered.contains(n)) {
        if (!visiting.add(n))
          throw new PluginException(s"dependency cycle involving: $n")
        byName.get(n).foreach(_.manifest().deps
          .filterNot(plugins.contains).foreach(visit))
        visiting.remove(n)
        if (!byName.contains(n) && !plugins.contains(n))
          throw new PluginException(s"missing dependency: $n")
        if (byName.contains(n)) ordered.add(n)
      }
    }
    byName.keys.foreach(visit)
    ordered.foreach(n => register(byName(n)))
  }

  def unregister(name: String): GraftPlugin = synchronized {
    val p = plugins.getOrElse(name,
      throw new PluginException(s"plugin not found: $name"))
    plugins.remove(name)
    try p.onUnload()
    catch {
      case e: Exception =>
        plugins(name) = p // restore so the registry stays consistent
        throw new PluginException(s"on_unload failed for '$name': ${e.getMessage}")
    }
    p
  }

  def get(name: String): Option[GraftPlugin] = synchronized(plugins.get(name))

  def list(): Seq[PluginManifest] =
    synchronized(plugins.values.map(_.manifest()).toSeq)

  def listByType(pluginType: String): Seq[PluginManifest] =
    list().filter(_.pluginType == pluginType)

  def size: Int = synchronized(plugins.size)

  // ------------------------------------------------------ Spark bindings

  /** Register `dist_<name>` as a session UDF so SQL and Column code can
    * call the plugin distance; returns the Column-level function.
    */
  def bindDistance(spark: SparkSession,
                   plugin: DistancePlugin): (Column, Column) => Column = {
    val f = udf((a: Seq[Float], b: Seq[Float]) =>
      plugin.computeDistance(a.toArray, b.toArray))
    spark.udf.register(s"dist_${plugin.distanceName()}", f)
    (a: Column, b: Column) => f(a, b)
  }

  /** Apply an embedding transformer to an ARRAY&lt;FLOAT&gt; column. */
  def transformColumn(plugin: EmbeddingTransformerPlugin,
                      vec: Column, forQuery: Boolean = false): Column = {
    val f = udf((v: Seq[Float]) =>
      if (v == null) null
      else if (forQuery) plugin.transformForQuery(v.toArray)
      else plugin.transformForIndex(v.toArray))
    f(vec)
  }

  /** Adapt a post-search hook plugin onto [[graft.ops.Hooks]]' chain. */
  def asSearchHook(plugin: PostSearchHookPlugin): DataFrame => DataFrame =
    plugin.afterSearch
}

/** Discovery + isolated loading (the reference PluginDirectory
  * :269-338 / WasmSandbox :841 analogue): each directory gets its OWN
  * URLClassLoader (child-first for plugin classes is not needed — plugin
  * API classes must resolve from the host), and plugins announce
  * themselves through the standard `META-INF/services/graft.plugins
  * .GraftPlugin` provider file, the JVM's native discovery protocol.
  */
object PluginLoader {

  /** Load every service-declared plugin from jars/classes under `dir`. */
  def discover(dir: Path): Seq[GraftPlugin] = {
    val urls: Array[URL] =
      if (!Files.isDirectory(dir)) Array.empty
      else {
        val jars = Files.list(dir).iterator().asScala
          .filter(_.toString.endsWith(".jar")).map(_.toUri.toURL).toArray
        jars :+ dir.toUri.toURL // also plain .class trees with META-INF/
      }
    val loader = new URLClassLoader(urls, classOf[GraftPlugin].getClassLoader)
    java.util.ServiceLoader.load(classOf[GraftPlugin], loader)
      .iterator().asScala.toSeq
  }

  /** Discover under `dir` and register everything dependency-ordered. */
  def loadInto(manager: PluginManager, dir: Path): Seq[PluginManifest] = {
    val found = discover(dir)
    manager.registerAll(found)
    found.map(_.manifest())
  }
}
