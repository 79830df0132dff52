package graft

import org.apache.spark.sql.functions._

import graft.needleql.{CollectionDef, NeedleSession, Parser}

/** Collection aliases (reference: database/aliases.rs). */
class AliasSpec extends SparkSpec {
  import spark.implicits._

  private def freshSession = {
    val s = new NeedleSession(spark)
    def coll(tag: String) = CollectionDef(
      Seq(("a", Array(1f, 0f), tag)).toDF("id", "vector", "metadata"))
    s.register("docs_v1", coll("v1")).register("docs_v2", coll("v2"))
    s
  }

  test("alias resolves in queries and update_alias repoints atomically (blue/green)") {
    val s = freshSession
    s.createAlias("docs", "docs_v1")
    def served = s.sql("SELECT metadata FROM docs")
      .collect().head.getString(0)
    assert(served == "v1")
    s.updateAlias("docs", "docs_v2")
    assert(served == "v2", "readers see the new target without re-registering")
    assert(s.canonicalName("docs").contains("docs_v2"))
    assert(s.aliasesForCollection("docs_v2") == Seq("docs"))
    assert(s.listAliases == Seq("docs" -> "docs_v2"))
  }

  test("creation rejects collisions; update rejects missing alias/target (aliases.rs:37-61,222-241)") {
    val s = freshSession
    s.createAlias("docs", "docs_v1")
    intercept[Parser.ParseError](s.createAlias("docs", "docs_v2"))
    intercept[Parser.ParseError](s.createAlias("docs_v2", "docs_v1")) // collection name
    intercept[Parser.ParseError](s.createAlias("x", "nope"))          // missing target
    intercept[Parser.ParseError](s.updateAlias("ghost", "docs_v1"))
    intercept[Parser.ParseError](s.updateAlias("docs", "nope"))
  }

  test("delete returns whether an alias existed; resolution fails after") {
    val s = freshSession
    s.createAlias("docs", "docs_v1")
    assert(s.deleteAlias("docs") && !s.deleteAlias("docs"))
    intercept[Parser.ParseError](s.sql("SELECT * FROM docs"))
  }

  test("writes through an alias land on the canonical collection") {
    val s = freshSession
    s.createAlias("docs", "docs_v1")
    s.sql("INSERT INTO docs (id, vector, metadata) VALUES ('b', [0.0, 1.0], 'new')")
    assert(s.sql("SELECT id FROM docs_v1").count() == 2)
    assert(s.collections.keySet == Set("docs_v1", "docs_v2"),
      "no phantom collection named after the alias")
    s.sql("DELETE FROM docs WHERE id = 'b'")
    assert(s.sql("SELECT id FROM docs_v1").count() == 1)
  }
}
