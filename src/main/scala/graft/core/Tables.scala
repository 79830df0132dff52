package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata layout (TESTDATA.md): one
  * parquet file per table under a scale-factor directory. At cluster scale
  * the same API points at partitioned parquet/Delta directories — nothing
  * here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts generations vary: TIMESTAMP(NANOS) parquet is only readable
    // as a raw long (nanos since epoch, via the legacy conf); TIMESTAMP
    // (MICROS) arrives as a native timestamp. Consumers that do arithmetic
    // on ts must branch on the dtype; the assertion below makes any third
    // variant fail loudly instead of silently dropping a gate.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.types._
      val dt = df.schema("ts").dataType
      require(dt == LongType || dt.isInstanceOf[TimestampType] ||
        dt.isInstanceOf[TimestampNTZType],
        s"events.ts schema drift: $dt is neither long-nanos nor timestamp; " +
          "audit every consumer that does arithmetic on ts")
    }
    df
  }

  /** Register every table as a temp view (for SQL / NeedleQL layers). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Persist a table bucketed on its join key (SURVEY §7: "bucketing for
    * co-located joins"). Two tables bucketed identically on the same key
    * join with ZERO exchanges — the shuffle happens once at write time and
    * is amortized over every subsequent join, the standard layout for the
    * fact⋈fact joins (lineitem⋈orders) that dominate 100 TB plans where
    * neither side broadcasts.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    var w = df.write.format("parquet").mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }
}
