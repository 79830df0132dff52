package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Typed vector namespaces (reference: src/services/collection/
  * vector_namespace.rs): a collection holds multiple NAMED vector fields
  * with independent dimensions and distance functions, searchable per
  * field and fusable across fields with weighted reciprocal-rank fusion
  * (`weight / (rank₀ + 60)`, per-field k×3 over-fetch —
  * vector_namespace.rs:271-302).
  *
  * Spark-native shape: multi-vector-per-document is just multiple array
  * columns on one DataFrame — storage, schema evolution, and per-field
  * NULL-ness come free from the relational model (the reference builds a
  * document store + field registry for this; here `FieldQuery.vector`
  * IS the column). Per-field search is a narrow scored scan into
  * TakeOrderedAndProject; fusion unions the k-bounded candidate lists,
  * ranks them with a window PARTITIONED by field (bounded input:
  * fields × 3k rows), and aggregates one grouped sum — no cartesian, no
  * global window, no driver loop.
  *
  * Determinism: per-field ranking tie-breaks on id (the reference's
  * sort_by_key is unstable across equal distances).
  */
object VectorNamespace {

  /** One field's query leg (vector_namespace.rs FieldQuery): the named
    * vector column, its metric, the query vector, and its fusion weight.
    */
  final case class FieldQuery(field: String, vector: Column,
                              metric: String, query: Array[Float],
                              weight: Double = 1.0)

  /** Brute-force single-field top-k (vector_namespace.rs:229-268):
    * documents missing the field (NULL column value) are skipped, like
    * the reference's `doc.fields.get(field)?`.
    */
  def searchField(df: DataFrame, idCol: Column, q: FieldQuery, k: Int,
                  distanceColumn: Column => Column = identity): DataFrame =
    df.filter(q.vector.isNotNull)
      .select(idCol.as("id"),
        distanceColumn(Distances.distance(q.metric, q.vector,
          lit(q.query.map(_.toDouble)))).as("distance"),
        lit(q.field).as("field"))
      .orderBy(col("distance").asc, col("id").asc)
      .limit(k)

  /** Weighted RRF across fields (vector_namespace.rs:271-302):
    * per-field top-(k·3) legs union, rank within each LEG, and every
    * document sums `weight / (rank₀ + 60)` over the legs it appears in;
    * top-k by fused score descending, id ascending.
    *
    * Legs are keyed by query INDEX, not field name: the reference
    * processes each FieldQuery independently, so two legs may legally
    * name the same vector field (e.g. the same column probed with two
    * query vectors or two weights) and each contributes its own rank
    * sequence. Keying by field would merge such legs into one 0..2·3k-1
    * ranking and collapse their weights to one map entry.
    */
  def fusionSearch(df: DataFrame, idCol: Column, queries: Seq[FieldQuery],
                   k: Int,
                   distanceColumn: Column => Column = identity): DataFrame = {
    require(k > 0, s"k=$k")
    if (queries.isEmpty) return df.sparkSession.emptyDataFrame
      .select(lit("").as("id"), lit(0.0).as("score")).limit(0)
    val perFieldK = k * 3
    val legs = queries.zipWithIndex.map { case (q, i) =>
      searchField(df, idCol, q, perFieldK, distanceColumn)
        .withColumn("__leg", lit(i))
        .withColumn("__weight", lit(q.weight))
    }.reduce(_ unionByName _)
    legs
      .withColumn("__rank0", row_number().over(
        Window.partitionBy(col("__leg"))
          .orderBy(col("distance").asc, col("id").asc)) - 1)
      .groupBy(col("id"))
      .agg(sum(col("__weight") / (col("__rank0") + 60.0)).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
