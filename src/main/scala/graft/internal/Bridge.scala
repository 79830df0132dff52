package graft.internal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.GraftShims

/** Column <-> catalyst Expression bridge for Spark 4.x (classic, non-Connect). */
private[graft] object Bridge {
  def col(e: Expression): Column = GraftShims.column(e)
  def expr(c: Column): Expression = GraftShims.expression(c)
}
