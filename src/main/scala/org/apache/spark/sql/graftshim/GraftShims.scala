package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark 4 APIs (Column <-> catalyst Expression).
  * Spark 4 removed the public `new Column(expr)` constructor; the supported
  * in-JVM ("classic") conversion lives in `ExpressionUtils`, which is
  * package-private — hence this shim living under `org.apache.spark.sql`.
  * This is the only place the engine reaches into Spark internals.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
