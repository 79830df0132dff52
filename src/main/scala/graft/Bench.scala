package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // avoid RPC-backed executor class loading (see build.sbt javaOptions)
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/IO paths once so the first measured query
    // does not absorb session initialization (standard bench practice).
    spark.range(1000000).selectExpr("sum(id)").collect()
    try graft.core.Tables.load(spark, sfDir, "nation").count()
    catch { case _: Throwable => () }
    // optional args: bench only the named queries (local iteration)
    val only = args.toSet
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // collect, not count: count() lets Catalyst prune the projections a
      // query exists to compute (result sets are bounded, so collect is safe)
      try { fn(spark, sfDir).collect().length } catch { case _: Throwable => -1 }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
