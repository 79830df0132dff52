ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "needlespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The SIMD serving kernels (graft.ann.VectorSimd) use the Java 17
// incubator vector module. Java compiles first so scalac reads the
// classfile (primitive-only signatures) and never has to resolve the
// incubator types itself.
compileOrder := CompileOrder.JavaThenScala
javacOptions ++= Seq("--add-modules", "jdk.incubator.vector")
// The driver parses Bench's final JSON line from the LAST ~2000 chars of
// stdout; sbt's "[success] Total time ..." trailer eats ~70 chars of that
// window, so suppress it (exit codes still signal failure).
Global / showSuccess := false
// Forked `run` output is decorated "[info] ..." by sbt's logger by default,
// which corrupts Bench's machine-parsed final JSON line — stream it raw.
outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  // SIMD serving kernels; when absent at runtime graft.ann.Simd
  // falls back to the scalar kernels per JVM.
  "--add-modules", "jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Session artifact isolation (Spark 4) routes executor class lookups
  // through an RPC-backed ExecutorClassLoader even in local mode; every
  // class-miss probe (Janino codegen, lambda deserialization) then pays a
  // driver round-trip — tens of seconds per complex query. Irrelevant for
  // a single-session engine, so disable it.
  "-Dspark.sql.artifact.isolation.enabled=false",
  // 24g default: the bench/verify suites persist index frames and run many
  // broadcast joins across ~70 queries in one JVM; at 8g some runs hit
  // full-GC storms that triple wall-clock (the box has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
