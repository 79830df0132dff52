package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark session extension entry point — installs the engine's SQL surface
  * into any session at builder time:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Registers the seven codegen'd `dist_<metric>(a, b)` functions
  * (SURVEY.md §4.2 — the only custom Catalyst surface the engine needs;
  * everything else is expressible with built-in operators).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.Metric.all.foreach { m =>
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(s"dist_${m.name}"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.VectorDistance].getName, s"dist_${m.name}"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.VectorDistance(exprs(0), exprs(1), m)))
    }
  }
}
