package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.DimReduce
import graft.needleql.{CollectionDef, NeedleSession}
import graft.ops.{Anomaly, Search, VectorAnalytics}

/** Interactive data explorer — the terminal analogue of the reference's
  * TUI (src/tui.rs:60-104 views: Dashboard / Collections / Search /
  * Clusters / Anomalies / Help) and visual explorer
  * (src/visual_explorer.rs: 2-D projection :97, paginated browse :710,
  * search explain :568).
  *
  * The reference renders ratatui panels over a single-node store; here
  * each view is a command whose answer is a Spark plan over the
  * registered collections, so "explore" works identically on a laptop
  * parquet file and a 100 TB lake table — the sample/limit shapes keep
  * every view's driver footprint bounded (head/browse page through
  * `limit`, projection fits on a bounded sample, anomaly/cluster views
  * reuse the engine's scale-shaped ops).
  *
  * Wire: line-oriented stdin/stdout (scriptable and testable — the same
  * contract `Cli.run` has), launched as `graft.Cli explore
  * --collection name=path ...`.
  */
object Explorer {

  private case class State(session: NeedleSession,
                           collections: Map[String, DataFrame],
                           var current: Option[String],
                           var page: Int = 0)

  private val pageSize = 10

  /** Vector column of a collection: `embedding` or `vector`, whichever
    * exists (the two conventions across the testdata + bundle formats).
    */
  private def vecColOf(df: DataFrame): Option[String] =
    Seq("embedding", "vector").find(df.columns.contains)

  private def idColOf(df: DataFrame): String =
    Seq("id", "doc_id", "vec_id").find(df.columns.contains)
      .getOrElse(df.columns.head)

  def repl(spark: SparkSession, collections: Map[String, String],
           out: String => Unit, in: () => Iterator[String]): Int = {
    val session = new NeedleSession(spark)
    val dfs = collections.map { case (name, path) =>
      val df = spark.read.parquet(path)
      session.register(name, CollectionDef(df))
      name -> df
    }
    val st = State(session, dfs, dfs.keys.headOption)
    out(s"graft explorer — ${dfs.size} collection(s): " +
      dfs.keys.mkString(", "))
    out("type 'help' for commands, 'quit' to leave")
    var code = 0
    val lines = in()
    var done = false
    while (!done && lines.hasNext) {
      val line = lines.next().trim
      if (line.nonEmpty) {
        val (cmd, arg) = line.split("\\s+", 2) match {
          case Array(c, a) => (c, a)
          case Array(c)    => (c, "")
        }
        try cmd match {
          case "quit" | "exit" | "q" => done = true
          case "help"        => help(out)
          case "dashboard"   => dashboard(st, out)
          case "ls" | "collections" => ls(st, out)
          case "use"         => use(st, arg, out)
          case "schema"      => withCurrent(st, out)(schema(_, out))
          case "count"       => withCurrent(st, out)(df => out(df.count().toString))
          case "head"        => withCurrent(st, out)(head(_, arg, out))
          case "browse"      => withCurrent(st, out)(browse(st, _, arg, out))
          case "search"      => withCurrent(st, out)(search(_, arg, out))
          case "clusters"    => withCurrent(st, out)(clusters(_, arg, out))
          case "anomalies"   => withCurrent(st, out)(anomalies(_, arg, out))
          case "project"     => withCurrent(st, out)(project(_, arg, out))
          case "sql"         => sql(st, arg, out)
          case "explain"     => explain(st, arg, out)
          case other =>
            out(s"unknown command: $other (try 'help')"); code = 1
        } catch {
          case e: Exception =>
            out(s"error: ${e.getMessage}"); code = 1
        }
      }
    }
    code
  }

  private def withCurrent(st: State, out: String => Unit)
                         (f: DataFrame => Unit): Unit =
    st.current.flatMap(st.collections.get) match {
      case Some(df) => f(df)
      case None     => out("no collection selected (use <name>)")
    }

  private def help(out: String => Unit): Unit = out(
    """commands (each mirrors a reference TUI view):
      |  dashboard            totals across collections    [tui: Dashboard]
      |  ls                   list collections             [tui: Collections]
      |  use <name>           select a collection
      |  schema | count       shape of the selection
      |  head [n]             first n rows (default 5)
      |  browse [next|prev]   page through rows            [explorer: browse]
      |  search <id|v,v,..> [k]  top-k nearest             [tui: Search]
      |  clusters [k]         k-means summary              [tui: Clusters]
      |  anomalies [k]        LOF outliers                 [tui: Anomalies]
      |  project [n]          2-D PCA ASCII scatter        [explorer: project]
      |  sql <needleql>       run a query
      |  explain <needleql>   show the Spark plan
      |  quit""".stripMargin)

  /** tui.rs render_dashboard: per-collection and total counts/dims. */
  private def dashboard(st: State, out: String => Unit): Unit = {
    var total = 0L
    st.collections.foreach { case (name, df) =>
      val n = df.count()
      total += n
      val dims = vecColOf(df)
        .map(v => df.select(size(col(v))).limit(1).collect()
          .headOption.map(_.getInt(0)).getOrElse(0))
        .getOrElse(0)
      val mark = if (st.current.contains(name)) "*" else " "
      out(f"$mark $name%-20s rows=$n%-8d dims=$dims")
    }
    out(s"  total vectors: $total")
  }

  private def ls(st: State, out: String => Unit): Unit =
    st.collections.keys.toSeq.sorted.foreach { name =>
      val mark = if (st.current.contains(name)) "*" else " "
      out(s"$mark $name")
    }

  private def use(st: State, arg: String, out: String => Unit): Unit =
    if (st.collections.contains(arg)) {
      st.current = Some(arg); st.page = 0; out(s"using $arg")
    } else out(s"no such collection: $arg")

  private def schema(df: DataFrame, out: String => Unit): Unit =
    df.schema.fields.foreach(f =>
      out(s"  ${f.name}: ${f.dataType.simpleString}"))

  private def fmtRow(df: DataFrame)(r: org.apache.spark.sql.Row): String =
    (0 until r.length).map { i =>
      r.get(i) match {
        case s: scala.collection.Seq[_] if s.length > 4 =>
          s.take(4).mkString("[", ", ", ", …]")
        case v => String.valueOf(v)
      }
    }.mkString("\t")

  private def head(df: DataFrame, arg: String, out: String => Unit): Unit = {
    val n = if (arg.nonEmpty) arg.toInt else 5
    out(df.columns.mkString("\t"))
    df.limit(n).collect().foreach(r => out(fmtRow(df)(r)))
  }

  /** visual_explorer.rs browse :710: stable-ordered pagination. */
  private def browse(st: State, df: DataFrame, arg: String,
                     out: String => Unit): Unit = {
    arg match {
      case "next" => st.page += 1
      case "prev" => st.page = math.max(0, st.page - 1)
      case ""     =>
      case p      => st.page = p.toInt
    }
    val idc = idColOf(df)
    out(s"page ${st.page} (by $idc)")
    out(df.columns.mkString("\t"))
    df.orderBy(col(idc)).offset(st.page * pageSize).limit(pageSize)
      .collect().foreach(r => out(fmtRow(df)(r)))
  }

  /** tui.rs render_search: query by row id or literal vector. */
  private def search(df: DataFrame, arg: String, out: String => Unit): Unit = {
    val parts = arg.split("\\s+")
    val k = if (parts.length > 1) parts(1).toInt else 5
    val vc = vecColOf(df).getOrElse(
      throw new IllegalArgumentException("collection has no vector column"))
    val idc = idColOf(df)
    val qv: Array[Float] =
      if (parts(0).contains(",")) parts(0).split(",").map(_.toFloat)
      else df.filter(col(idc).cast("string") === parts(0))
        .select(col(vc)).collect().headOption
        .map(_.getSeq[Float](0).toArray)
        .getOrElse(throw new IllegalArgumentException(
          s"no row with $idc=${parts(0)}"))
    val res = Search.topK(df, col(vc), lit(qv), k, "cosine", idc)
      .select(col(idc).cast("string").as("id"),
        round(col("distance"), 6).as("distance"))
      .collect()
    res.foreach(r => out(f"  ${r.getString(0)}%-12s ${r.getDouble(1)}%.6f"))
  }

  /** tui.rs render_clusters: k-means summary (id, size, share). */
  private def clusters(df: DataFrame, arg: String, out: String => Unit): Unit = {
    val k = if (arg.nonEmpty) arg.toInt else 5
    val vc = vecColOf(df).getOrElse(
      throw new IllegalArgumentException("collection has no vector column"))
    val assigned = VectorAnalytics.cluster(df, col(idColOf(df)), col(vc), k)
    val sizes = assigned.groupBy("cluster").count()
      .orderBy(col("count").desc, col("cluster")).collect()
    val total = sizes.map(_.getLong(1)).sum.toDouble
    sizes.foreach { r =>
      val share = r.getLong(1) / total
      val bar = "#" * math.round(share * 40).toInt
      out(f"  cluster ${r.getInt(0)}%-3d ${r.getLong(1)}%6d  $bar")
    }
  }

  /** tui.rs render_anomalies: top-k LOF outliers. */
  private def anomalies(df: DataFrame, arg: String,
                        out: String => Unit): Unit = {
    val k = if (arg.nonEmpty) arg.toInt else 10
    val vc = vecColOf(df).getOrElse(
      throw new IllegalArgumentException("collection has no vector column"))
    val idc = idColOf(df)
    Anomaly.lof(df, col(idc), col(vc), k = 10)
      .orderBy(col("lof_score").desc).limit(k).collect()
      .foreach(r => out(f"  ${String.valueOf(r.get(0))}%-12s lof=${r.getDouble(1)}%.4f"))
  }

  /** visual_explorer.rs project :97 (PCA method): fit 2 components on a
    * bounded sample, render an ASCII scatter of up to `n` points.
    */
  private def project(df: DataFrame, arg: String, out: String => Unit): Unit = {
    val n = if (arg.nonEmpty) arg.toInt else 200
    val vc = vecColOf(df).getOrElse(
      throw new IllegalArgumentException("collection has no vector column"))
    val pca = DimReduce.fitPca(df, col(vc), nComponents = 2)
    val pts = df.select(pca.transform(col(vc)).as("xy")).limit(n)
      .collect().map(_.getSeq[Float](0))
    val (w, h) = (60, 20)
    val (xs, ys) = (pts.map(_(0)), pts.map(_(1)))
    val (x0, x1) = (xs.min, xs.max)
    val (y0, y1) = (ys.min, ys.max)
    val grid = Array.fill(h, w)(' ')
    pts.foreach { p =>
      val cx = if (x1 > x0) ((p(0) - x0) / (x1 - x0) * (w - 1)).toInt else 0
      val cy = if (y1 > y0) ((p(1) - y0) / (y1 - y0) * (h - 1)).toInt else 0
      grid(h - 1 - cy)(cx) = '*'
    }
    out(s"PCA projection of ${pts.length} points " +
      f"(var explained: ${pca.explainedVarianceRatio.sum * 100}%.1f%%)")
    grid.foreach(row => out("|" + new String(row) + "|"))
  }

  private def sql(st: State, q: String, out: String => Unit): Unit = {
    if (q.isEmpty) { out("usage: sql <query>"); return }
    val df = st.session.sql(q)
    out(df.columns.mkString("\t"))
    df.limit(50).collect().foreach(r => out(fmtRow(df)(r)))
  }

  private def explain(st: State, q: String, out: String => Unit): Unit = {
    if (q.isEmpty) { out("usage: explain <query>"); return }
    out(st.session.sql(q).queryExecution.executedPlan.toString)
  }
}
