package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A declared operator query: the Spark implementation plus (when the
    * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
    * over the same parquet tables. Column names/aliases MUST match between
    * the two — the driver's comparator sorts columns by name before hashing.
    */
  final case class Q(fn: (SparkSession, String) => DataFrame,
                     oracle: Option[String])

  object Q {
    def apply(oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
      Q(fn, Some(oracle))
    def noOracle(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None)
  }
}
