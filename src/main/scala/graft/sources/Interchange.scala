package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interchange formats (SURVEY.md §2.1; reference:
  * src/indexing/columnar.rs, src/collection/bundle.rs,
  * src/database/mod.rs:965-1020).
  *
  * The needle columnar JSONL convention is
  * `{"id": Utf8, "vector": [f32...], "metadata": {json}}` per line —
  * directly `spark.read.json`-able. Bundles are a directory of parquet plus
  * a `config.json` (dims, distance, counts): the portable collection form.
  */
object Interchange {

  val jsonlSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("vector", ArrayType(FloatType)),
    StructField("metadata", StringType))) // JSON kept as string (dynamic)

  /** Export (id, vector, metadata) to needle-columnar JSONL. `metadata` may
    * be any column — structs are serialized to JSON objects, strings are
    * assumed to already hold JSON.
    */
  def exportJsonl(df: DataFrame, path: String, idCol: String = "id",
                  vecCol: String = "vector",
                  metaCol: Option[String] = None): Unit = {
    val meta = metaCol.map(m => df.schema(m).dataType match {
      case StringType => from_json(col(m), MapType(StringType, StringType)).as("metadata")
      case _          => col(m).as("metadata")
    }).getOrElse(lit(null).as("metadata"))
    df.select(col(idCol).cast("string").as("id"),
        col(vecCol).cast("array<float>").as("vector"), meta)
      .write.mode("overwrite").json(path)
  }

  /** Import needle-columnar JSONL (schema enforced; metadata back to a JSON
    * string for the dynamic-metadata model).
    */
  def importJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(StructType(Seq(
        StructField("id", StringType),
        StructField("vector", ArrayType(FloatType)),
        StructField("metadata", MapType(StringType, StringType)))))
      .json(path)
      .withColumn("metadata", to_json(col("metadata")))

  /** Bundle export: parquet + config.json (reference: bundle.rs). */
  def exportBundle(df: DataFrame, dir: String, name: String, dims: Int,
                   distance: String): Unit = {
    df.write.mode("overwrite").parquet(s"$dir/data.parquet")
    val cfg =
      s"""{"name": "$name", "dimensions": $dims, "distance": "$distance",
         | "count": ${df.count()}, "format_version": 1}""".stripMargin
    val p = java.nio.file.Paths.get(dir, "config.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, cfg)
  }

  final case class BundleConfig(name: String, dimensions: Int,
                                distance: String, count: Long)

  def importBundle(spark: SparkSession, dir: String): (DataFrame, BundleConfig) = {
    val cfgJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "config.json"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(cfgJson)
    val cfg = BundleConfig(node.get("name").asText(),
      node.get("dimensions").asInt(), node.get("distance").asText(),
      node.get("count").asLong())
    (spark.read.parquet(s"$dir/data.parquet"), cfg)
  }

  /** Whole-database export (reference: database/mod.rs:965 export_all_json):
    * one JSONL directory per collection under `dir/<name>/`, plus a
    * manifest listing the collections. Snapshot entries
    * (`__snapshot__…`) are exported like the reference's JSON dump, which
    * serializes every stored collection.
    */
  def exportAll(collections: Map[String, DataFrame], dir: String,
                idCol: String = "id", vecCol: String = "vector",
                metaCol: Option[String] = Some("metadata")): Unit = {
    collections.foreach { case (name, df) =>
      val m = metaCol.filter(df.columns.contains)
      exportJsonl(df, s"$dir/$name", idCol, vecCol, m)
    }
    val manifest = collections.keys.toSeq.sorted
      .map(n => "\"" + n + "\"").mkString("[", ",", "]")
    val p = java.nio.file.Paths.get(dir, "manifest.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, s"""{"collections": $manifest}""")
  }

  /** Whole-database import (reference: database/mod.rs:995). */
  def importAll(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val manifest = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "manifest.json")))
    val names = manifest.get("collections").elements()
    val out = Map.newBuilder[String, DataFrame]
    while (names.hasNext) {
      val n = names.next().asText()
      out += n -> importJsonl(spark, s"$dir/$n")
    }
    out.result()
  }
}
