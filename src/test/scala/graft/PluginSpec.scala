package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.plugins._

/** Plugin-system contract tests (reference plugin.rs semantics):
  * manager lifecycle/duplicates/dependency order/cycles with in-process
  * plugins, ServiceLoader discovery from an isolated URLClassLoader over
  * a plugin compiled WITH JAVAC AT TEST TIME (proving a plain-Java plugin
  * implements the API with no Scala tooling), and a DistancePlugin bound
  * into a real Spark query.
  */
class PluginSpec extends SparkSpec {
  import spark.implicits._

  private def mk(nm: String, tpe: String = PluginTypes.Custom,
                 deps: Seq[String] = Nil,
                 log: scala.collection.mutable.Buffer[String] = null,
                 failLoad: Boolean = false,
                 failUnload: Boolean = false): GraftPlugin = new GraftPlugin {
    def manifest() = PluginManifest(nm, "1.0.0", "t", "d", tpe,
      java.util.Arrays.asList(deps: _*))
    def onLoad(): Unit = {
      if (failLoad) throw new IllegalStateException("boom")
      if (log != null) log += s"load:$nm"
    }
    def onUnload(): Unit = {
      if (failUnload) throw new IllegalStateException("boom")
      if (log != null) log += s"unload:$nm"
    }
  }

  test("register/unregister lifecycle, duplicates, unknown types") {
    val log = scala.collection.mutable.Buffer.empty[String]
    val m = new PluginManager
    m.register(mk("a", log = log))
    assert(log == Seq("load:a") && m.size == 1)
    intercept[PluginException](m.register(mk("a")))       // duplicate
    intercept[PluginException](m.register(mk("x", tpe = "nope")))
    m.unregister("a")
    assert(log == Seq("load:a", "unload:a") && m.size == 0)
    intercept[PluginException](m.unregister("a"))          // not found
    // on_load failure never registers; on_unload failure restores
    intercept[PluginException](m.register(mk("f", failLoad = true)))
    assert(m.size == 0)
    m.register(mk("g", failUnload = true))
    intercept[PluginException](m.unregister("g"))
    assert(m.get("g").isDefined, "failed unload must restore the plugin")
  }

  test("dependency-ordered bulk registration and cycle detection") {
    val log = scala.collection.mutable.Buffer.empty[String]
    val m = new PluginManager
    // c -> b -> a, registered in reverse
    m.registerAll(Seq(mk("c", deps = Seq("b"), log = log),
      mk("b", deps = Seq("a"), log = log), mk("a", log = log)))
    assert(log == Seq("load:a", "load:b", "load:c"))
    assert(m.listByType(PluginTypes.Custom).map(_.name).toSet == Set("a", "b", "c"))
    val m2 = new PluginManager
    intercept[PluginException](
      m2.registerAll(Seq(mk("p", deps = Seq("q")), mk("q", deps = Seq("p")))))
    assert(m2.size == 0, "cycle must fail before any onLoad")
    intercept[PluginException](m2.registerAll(Seq(mk("r", deps = Seq("absent")))))
  }

  /** Compile a plain-Java plugin + ServiceLoader provider file into a
    * temp directory — the test-time stand-in for a user's plugin build.
    */
  private def compileJavaPlugin(): Path = {
    val dir = Files.createTempDirectory("graft-plugins")
    val src = Files.createDirectories(dir.resolve("testplugins"))
      .resolve("WeightedHead.java")
    Files.writeString(src,
      """package testplugins;
        |import graft.plugins.*;
        |public class WeightedHead implements DistancePlugin {
        |  public PluginManifest manifest() {
        |    return new PluginManifest("weighted-head", "1.0.0", "it",
        |      "abs-diff of the first component", "distance",
        |      java.util.Collections.emptyList());
        |  }
        |  public void onLoad() {}
        |  public void onUnload() {}
        |  public float computeDistance(float[] a, float[] b) {
        |    return Math.abs(a[0] - b[0]);
        |  }
        |  public String distanceName() { return "weighted_head"; }
        |}
        |""".stripMargin)
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    assume(javac != null, "JDK compiler unavailable")
    val rc = javac.run(null, null, null,
      "-cp", System.getProperty("java.class.path"),
      "-d", dir.toString, src.toString)
    assert(rc == 0, "javac failed")
    val meta = Files.createDirectories(dir.resolve("META-INF/services"))
    Files.writeString(meta.resolve("graft.plugins.GraftPlugin"),
      "testplugins.WeightedHead\n")
    dir
  }

  test("ServiceLoader discovery of a javac-compiled Java plugin") {
    val dir = compileJavaPlugin()
    val m = new PluginManager
    val loaded = PluginLoader.loadInto(m, dir)
    assert(loaded.map(_.name) == Seq("weighted-head"))
    assert(m.listByType(PluginTypes.Distance).map(_.name) == Seq("weighted-head"))
    val p = m.get("weighted-head").get.asInstanceOf[DistancePlugin]
    assert(p.computeDistance(Array(3f, 9f), Array(1f, 9f)) == 2f)
    // the plugin class lives in the isolated loader, not the host one
    assert(p.getClass.getClassLoader != getClass.getClassLoader)
    assert(PluginLoader.discover(dir.resolve("missing")).isEmpty)
  }

  test("DistancePlugin binds into a live Spark query") {
    object InvertedDot extends DistancePlugin {
      def manifest() = PluginManifest("inv-dot", "1.0.0", "t",
        "negated dot product", PluginTypes.Distance,
        java.util.Collections.emptyList())
      def onLoad(): Unit = ()
      def onUnload(): Unit = ()
      def computeDistance(a: Array[Float], b: Array[Float]): Float = {
        var s = 0f; var i = 0
        while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
        -s
      }
      def distanceName() = "inv_dot"
    }
    val m = new PluginManager
    m.register(InvertedDot)
    val dist = m.bindDistance(spark, InvertedDot)
    val df = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 5f)), (3L, Array(2f, 2f)))
      .toDF("id", "v")
    val got = df.withColumn("d", dist(col("v"), typedLit(Array(1f, 1f))))
      .orderBy(col("d").asc, col("id").asc)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2L, 3L, 1L)) // most-aligned first under negated dot
    // and the session-registered SQL name works too
    df.createOrReplaceTempView("plug_v")
    val viaSql = spark.sql(
      "SELECT id FROM plug_v ORDER BY dist_inv_dot(v, array(1.0f, 1.0f)), id")
      .as[Long].collect().toSeq
    assert(viaSql == Seq(2L, 3L, 1L))
  }

  test("embedding transformer column + post-search hook adapter") {
    object Doubler extends EmbeddingTransformerPlugin {
      def manifest() = PluginManifest("doubler", "1.0.0", "t", "2x",
        PluginTypes.EmbeddingTransformer, java.util.Collections.emptyList())
      def onLoad(): Unit = ()
      def onUnload(): Unit = ()
      def transformForIndex(v: Array[Float]): Array[Float] = v.map(_ * 2f)
    }
    val m = new PluginManager
    m.register(Doubler)
    val out = Seq((1L, Array(1f, 2f))).toDF("id", "v")
      .withColumn("t", m.transformColumn(Doubler, col("v")))
      .select("t").as[Seq[Float]].head()
    assert(out == Seq(2f, 4f))
    val hook = m.asSearchHook(new PostSearchHookPlugin {
      def manifest() = PluginManifest("capper", "1.0.0", "t", "cap 1",
        PluginTypes.PostSearchHook, java.util.Collections.emptyList())
      def onLoad(): Unit = ()
      def onUnload(): Unit = ()
      def afterSearch(results: org.apache.spark.sql.DataFrame) =
        results.limit(1)
    })
    assert(hook(Seq((1L, 0.1), (2L, 0.2)).toDF("id", "distance")).count() == 1L)
  }
}
