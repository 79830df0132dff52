package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for the Python surface (python/graft_db + graft_langchain +
  * graft_llamaindex): drives `python/run_all.py`, which spark-submits
  * every python suite with the compiled classes on the driver classpath
  * and exits non-zero on any failure. Cancelled (not silently passed)
  * when spark-submit is missing from the environment.
  */
class PythonSuiteSpec extends AnyFunSuite {

  private def onPath(bin: String): Option[String] =
    (sys.env.getOrElse("PATH", "").split(":").toSeq :+ "/opt/spark/bin")
      .map(d => new java.io.File(d, bin))
      .find(f => f.isFile && f.canExecute).map(_.getAbsolutePath)

  test("python suites pass end-to-end via run_all.py") {
    val submit = onPath("spark-submit")
    assume(submit.isDefined, "spark-submit not available")
    val pb = new ProcessBuilder("python3", "python/run_all.py")
    pb.environment().put("SPARK_SUBMIT", submit.get)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    assert(code == 0, s"run_all.py exited $code:\n${out.takeRight(4000)}")
    assert(out.contains("python suites passed"), out.takeRight(2000))
  }
}
