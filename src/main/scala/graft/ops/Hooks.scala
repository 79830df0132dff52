package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Programmable pre-insert / post-search hooks (reference: src/hooks.rs) —
  * named, ordered chains of transforms applied to a batch before indexing
  * or to a result set after retrieval, with the reference's five built-ins.
  *
  * Spark re-expression: the reference mutates one row per closure call; a
  * hook here is a DataFrame transform applied ONCE per batch — the same
  * per-row semantics, vectorized (hooks stay inside whole-stage codegen
  * instead of calling a closure per row). Registration order is
  * application order, matching the reference's Vec of (name, hook)
  * (hooks.rs:139-215). Per-hook invocation counts mirror `stats()`.
  *
  * The reference's validate hook REJECTS the whole insert on the first
  * bad row (a per-row Err aborts the chain). Batch semantics make
  * abort-on-one-row an anti-pattern, so [[Hooks.validateDimensions]]
  * splits instead: valid rows flow on, rejects are quarantined and
  * retrievable via [[Registry.rejects]] — the documented divergence.
  */
object Hooks {

  type Transform = DataFrame => DataFrame

  final class Registry {
    private val insertHooks = mutable.LinkedHashMap[String, Transform]()
    private val searchHooks = mutable.LinkedHashMap[String, Transform]()
    private val counts = mutable.LinkedHashMap[String, Long]()
    private val rejected = mutable.LinkedHashMap[String, DataFrame]()

    def registerInsertHook(name: String, hook: Transform): Unit =
      insertHooks.put(name, hook)
    def registerSearchHook(name: String, hook: Transform): Unit =
      searchHooks.put(name, hook)
    def removeInsertHook(name: String): Boolean =
      insertHooks.remove(name).isDefined
    def removeSearchHook(name: String): Boolean =
      searchHooks.remove(name).isDefined
    def listHooks: (Seq[String], Seq[String]) =
      (insertHooks.keys.toSeq, searchHooks.keys.toSeq)
    def stats: Map[String, Long] = counts.toMap

    /** Quarantined rows from the last run of a splitting hook. */
    def rejects(name: String): Option[DataFrame] = rejected.get(name)
    private[Hooks] def quarantine(name: String, df: DataFrame): Unit =
      rejected.put(name, df)

    private def runChain(chain: mutable.LinkedHashMap[String, Transform],
                         df: DataFrame): DataFrame =
      chain.foldLeft(df) { case (acc, (name, hook)) =>
        counts.put(name, counts.getOrElse(name, 0L) + 1)
        hook(acc)
      }

    def runInsertHooks(batch: DataFrame): DataFrame =
      runChain(insertHooks, batch)
    def runSearchHooks(results: DataFrame): DataFrame =
      runChain(searchHooks, results)
  }

  // ------------------------------------------------------------- built-ins

  /** L2-normalize the vector column; zero vectors pass unchanged
    * (hooks.rs:257-268).
    */
  def normalizeL2(vecCol: String): Transform = { df =>
    val norm = sqrt(aggregate(col(vecCol), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    df.withColumn(vecCol,
      when(norm > 0.0,
        transform(col(vecCol), x => (x.cast("double") / norm).cast("float")))
        .otherwise(col(vecCol)))
  }

  /** Dimension validation (hooks.rs:270-283): valid rows continue; bad
    * rows are quarantined on the registry (see class doc).
    */
  def validateDimensions(vecCol: String, expected: Int,
                         registry: Registry,
                         name: String = "validate_dimensions"): Transform = {
    df =>
      registry.quarantine(name, df.filter(size(col(vecCol)) =!= expected))
      df.filter(size(col(vecCol)) === expected)
  }

  /** Stamp `_inserted_at` (epoch seconds) as a column — the reference puts
    * it in the metadata JSON object (hooks.rs:285-300); a column IS this
    * engine's metadata field.
    */
  def addTimestamp(now: Long): Transform =
    _.withColumn("_inserted_at", lit(now))

  /** Drop duplicate ids keeping the FIRST occurrence in result order
    * (hooks.rs:303-310). `orderCol` defines "first" explicitly — result
    * sets are k-bounded, so the per-id window is cheap.
    */
  def dedupResults(idCol: String, orderCol: String): Transform = { df =>
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(orderCol).asc, col(idCol).asc)
    df.withColumn("__hook_rn", row_number().over(w))
      .filter(col("__hook_rn") === 1).drop("__hook_rn")
  }

  /** Keep results with distance ≤ max (hooks.rs:312-319). */
  def scoreThreshold(distCol: String, maxDistance: Double): Transform =
    _.filter(col(distCol) <= maxDistance)
}
