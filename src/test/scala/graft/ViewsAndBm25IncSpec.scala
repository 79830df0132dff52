package graft

import org.apache.spark.sql.functions._

import graft.needleql.{CollectionDef, NeedleSession}
import graft.text.Bm25

class ViewsSpec extends SparkSpec {
  import spark.implicits._

  private def session: NeedleSession = {
    val s = new NeedleSession(spark)
    val docs = Seq(
      ("a", Array(1f, 0f), "news", 10.0),
      ("b", Array(0.9f, 0.3f), "news", 5.0),
      ("c", Array(0f, 1f), "blog", 8.0),
    ).toDF("id", "vector", "category", "score")
    s.register("docs", CollectionDef(docs))
    s
  }

  test("plain view: stored query re-executes against current data") {
    val s = session
    s.sql("CREATE VIEW newsy AS SELECT id, score FROM docs WHERE category = 'news'")
    val got = s.sql("SELECT id FROM newsy WHERE score >= 10 LIMIT 10")
      .as[String].collect().toSeq
    assert(got == Seq("a"))
    s.sql("DROP VIEW newsy")
    assertThrows[Exception](s.sql("SELECT id FROM newsy LIMIT 1").collect())
  }

  test("materialized view caches until refreshView") {
    val s = session
    s.sql("CREATE MATERIALIZED VIEW m AS SELECT id, score FROM docs WHERE score > 6")
    assert(s.sql("SELECT id FROM m LIMIT 10").as[String].collect().toSet == Set("a", "c"))
    // mutate the underlying collection; snapshot must NOT move...
    s.sql("DELETE FROM docs WHERE id = 'a'")
    assert(s.sql("SELECT id FROM m LIMIT 10").as[String].collect().toSet == Set("a", "c"))
    // ...until an explicit refresh (the staleness-driven job)
    s.refreshView("m")
    assert(s.sql("SELECT id FROM m LIMIT 10").as[String].collect().toSet == Set("c"))
  }
}

class Bm25IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("addDocuments/removeDocuments equal a full rebuild") {
    val d1 = Seq((1L, "spark shuffles data"), (2L, "flink streams data")).toDF("id", "text")
    val d2 = Seq((3L, "spark joins tables"), (2L, "flink replaced text")).toDF("id", "text")
    val cfg = Bm25.Config(stemming = false)

    val incr = Bm25.addDocuments(
      Bm25.index(d1, col("id"), col("text"), cfg), d2, col("id"), col("text"))
    val full = Bm25.index(
      d1.filter(col("id") =!= 2).unionByName(d2), col("id"), col("text"), cfg)

    def results(ix: Bm25.Index) =
      Bm25.search(ix, "spark data", 10).as[(Long, Double)].collect().toSeq
    assert(results(incr) == results(full))

    val removed = Bm25.removeDocuments(incr, Seq(3L).toDF("doc_id"))
    val fullRemoved = Bm25.index(
      d1.filter(col("id") =!= 2).unionByName(d2).filter(col("id") =!= 3),
      col("id"), col("text"), cfg)
    assert(results(removed) == results(fullRemoved))
  }
}
