package graft

import org.apache.spark.sql.functions._

import graft.needleql.{CollectionDef, NeedleSession}

/** Guards the Py4J-facing surface examples/pyspark_recipe.py drives: the
  * gateway can only call methods without Scala default args or Option
  * params, so these exact signatures must keep existing. (The recipe
  * itself was validated end-to-end against the compiled classes —
  * Spark SQL, NeedleQL session, REST from pure-Python HTTP.)
  */
class PyGatewaySurfaceSpec extends SparkSpec {

  private lazy val emb = sf("embeddings")

  test("CollectionDef.of overloads register and query through a session") {
    val session = new NeedleSession(spark)
    session.register("docs",
      CollectionDef.of(emb, "vec_id", "embedding", "cosine"))
    val hits = session.sql(
      "SELECT vec_id, label FROM docs WHERE label >= 5 LIMIT 3").collect()
    assert(hits.length == 3)
    // the 1-arg and textCol forms stay callable
    val renamed = emb.select(col("vec_id").as("id"),
      col("embedding").as("vector"))
    assert(CollectionDef.of(renamed).idCol == "id")
    val withText = CollectionDef.of(renamed, "id", "vector", "cosine", "id")
    assert(withText.textCol.contains("id"))
  }

  test("RestApi serves over HTTP with a plain no-arg constructor") {
    val api = new graft.server.RestApi(spark)
    val server = api.serve(0)
    try {
      val (s, body) = api.handle("GET", "/health", "")
      assert(s == 200 && body.contains("ok"))
      assert(server.getAddress.getPort > 0)
    } finally server.stop(0)
  }
}
