package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQL-style metadata analytics (SURVEY.md §2.6; reference:
  * src/search/sql_analytics.rs).
  *
  * The reference's analytics query is
  *   SELECT cols/aggs FROM coll WHERE <and-list> GROUP BY fields
  *   HAVING <agg predicates> ORDER BY ... LIMIT n
  * executed as filter -> group -> aggregate -> having -> order -> limit
  * (sql_analytics.rs:231-340). On Spark that pipeline maps 1:1 onto
  * `df.filter.groupBy.agg.filter.orderBy.limit`, which Catalyst turns into
  * partial (map-side) + final aggregation — no custom execution needed, and
  * the shape holds at any scale since the shuffle carries only group keys.
  *
  * `AggFunc` mirrors sql_analytics.rs:31-44 plus the NeedleQL session
  * aggregate COUNT_DISTINCT (query_lang/session.rs:14-27), which is exact
  * (countDistinct), not approximate, to match reference semantics.
  */
object Analytics {

  sealed trait AggFunc { def toColumn: Column }
  final case class CountAll(alias: String) extends AggFunc {
    def toColumn: Column = count(lit(1)).as(alias)
  }
  final case class CountField(field: String, alias: String) extends AggFunc {
    def toColumn: Column = count(col(field)).as(alias)
  }
  final case class CountDistinct(field: String, alias: String) extends AggFunc {
    def toColumn: Column = countDistinct(col(field)).as(alias)
  }
  final case class Sum(field: String, alias: String) extends AggFunc {
    def toColumn: Column = sum(col(field)).as(alias)
  }
  final case class Avg(field: String, alias: String) extends AggFunc {
    def toColumn: Column = avg(col(field)).as(alias)
  }
  final case class Min(field: String, alias: String) extends AggFunc {
    def toColumn: Column = min(col(field)).as(alias)
  }
  final case class Max(field: String, alias: String) extends AggFunc {
    def toColumn: Column = max(col(field)).as(alias)
  }

  final case class AnalyticsQuery(
      where: Option[Column] = None,
      groupBy: Seq[String] = Nil,
      aggs: Seq[AggFunc] = Nil,
      having: Option[Column] = None,
      orderBy: Seq[Column] = Nil,
      limit: Option[Int] = None) {

    def run(df: DataFrame): DataFrame = {
      val filtered = where.fold(df)(df.filter)
      val aggCols = aggs.map(_.toColumn)
      val grouped =
        if (groupBy.nonEmpty)
          filtered.groupBy(groupBy.map(col): _*)
            .agg(aggCols.head, aggCols.tail: _*)
        else if (aggs.nonEmpty)
          filtered.agg(aggCols.head, aggCols.tail: _*)
        else filtered
      val haved = having.fold(grouped)(grouped.filter)
      val ordered = if (orderBy.nonEmpty) haved.orderBy(orderBy: _*) else haved
      limit.fold(ordered)(ordered.limit)
    }
  }
}
