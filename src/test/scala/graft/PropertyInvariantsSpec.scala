package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.functions.DistanceKernels

/** ScalaCheck ports of the reference's proptest invariants (SURVEY.md §5;
  * reference: tests/property_tests.rs, 50 cases each). Metric-space laws
  * run on generated vectors against the native kernels; collection laws
  * run on generated small frames through the real operators.
  */
class PropertyInvariantsSpec extends SparkSpec {

  /** Vanilla-ScalaCheck runner (scalatestplus bridge is not on the
    * offline classpath): run the prop, fail the test on any counterexample.
    */
  private def check(p: Prop, minSuccessful: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, res.status.toString)
  }

  import spark.implicits._

  private val dim = 8
  private val genVec: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](dim, Gen.chooseNum(-10.0f, 10.0f))
  private def ad(v: Array[Float]): ArrayData = ArrayData.toArrayData(v)

  private val metrics: Seq[(String, (ArrayData, ArrayData) => Double)] = Seq(
    "cosine" -> DistanceKernels.cosine,
    "euclidean" -> DistanceKernels.euclidean,
    "manhattan" -> DistanceKernels.manhattan,
    "chebyshev" -> DistanceKernels.chebyshev,
    "hamming" -> DistanceKernels.hamming)

  test("distance non-negativity (property_tests.rs:96)") {
    check(forAll(genVec, genVec) { (a, b) =>
      metrics.forall { case (_, f) => f(ad(a), ad(b)) >= 0.0 }
    })
  }

  test("self-distance is zero (property_tests.rs:106)") {
    check(forAll(genVec) { a =>
      Seq[(ArrayData, ArrayData) => Double](
        DistanceKernels.euclidean, DistanceKernels.manhattan,
        DistanceKernels.chebyshev, DistanceKernels.hamming)
        .forall(f => math.abs(f(ad(a), ad(a))) < 1e-5)
    })
  }

  test("symmetry d(a,b) = d(b,a)") {
    check(forAll(genVec, genVec) { (a, b) =>
      metrics.forall { case (_, f) =>
        math.abs(f(ad(a), ad(b)) - f(ad(b), ad(a))) < 1e-5 }
    })
  }

  test("triangle inequality for the true metrics (property_tests.rs:266)") {
    check(forAll(genVec, genVec, genVec) { (a, b, c) =>
      Seq[(ArrayData, ArrayData) => Double](
        DistanceKernels.euclidean, DistanceKernels.manhattan,
        DistanceKernels.chebyshev)
        .forall { f =>
          f(ad(a), ad(c)) <= f(ad(a), ad(b)) + f(ad(b), ad(c)) + 1e-4
        }
    })
  }

  private val genColl: Gen[List[(String, Array[Float])]] =
    Gen.chooseNum(1, 12).flatMap { n =>
      Gen.listOfN(n, genVec).map(vs =>
        vs.zipWithIndex.map { case (v, i) => (s"v$i", v) })
    }

  test("search returns ≤ k, sorted ascending, idempotent (property_tests.rs:41,122,238)") {
    check(Prop.forAllNoShrink(genColl, genVec, Gen.chooseNum(1, 6)) { (rows, q, k) =>
      val df = rows.toDF("id", "vector")
      val run = () => graft.ops.Search.topK(df, col("vector"), lit(q), k,
        "euclidean", "id").select("id", "distance")
        .as[(String, Double)].collect().toSeq
      val r1 = run(); val r2 = run()
      r1.length <= k &&
        r1.map(_._2) == r1.map(_._2).sorted &&
        r1 == r2
    }, minSuccessful = 12)
  }

  test("upsert roundtrip: get returns the latest write (property_tests.rs:22,177)") {
    check(Prop.forAllNoShrink(genColl, genVec) { (rows, newVec) =>
      val df = rows.toDF("id", "vector")
      val target = rows.head._1
      val updates = Seq((target, newVec)).toDF("id", "vector")
      val after = graft.ops.Mutations.upsert(df, updates)
      val got = after.filter(col("id") === target)
        .select("vector").as[Array[Float]].collect()
      got.length == 1 && got.head.toSeq == newVec.toSeq &&
        after.count() == rows.length
    }, minSuccessful = 8)
  }

  test("delete removes exactly the tombstoned ids (property_tests.rs:62,208)") {
    check(Prop.forAllNoShrink(genColl) { rows =>
      val df = rows.toDF("id", "vector").withColumn("deleted", lit(false))
        .withColumn("ttl_expires_at", lit(null).cast("long"))
      val victims = rows.map(_._1).take(rows.length / 2 + 1).toSet
      val t = graft.ops.Mutations.tombstone(df, col("id").isin(victims.toSeq: _*))
      val alive = graft.ops.Mutations.compact(t, 0L)
        .select("id").as[String].collect().toSet
      alive == rows.map(_._1).toSet -- victims
    }, minSuccessful = 8)
  }

  test("NeedleQL parser is total: any token soup parses or raises its " +
       "typed errors (never NPE/MatchError/StackOverflow)") {
    import graft.needleql.{Lexer, Parser}
    val fragment = Gen.oneOf(
      "SELECT", "FROM", "WHERE", "*", ",", "(", ")", "docs", "vector",
      "SIMILAR", "TO", "$q", "LIMIT", "42", "-7", "3.14", "'str'", "AND",
      "OR", "NOT", "<", ">=", "=", "!=", "[1.0, 2.0]", "NEAREST_TO",
      "HYBRID_SEARCH", "RERANK", "BY", "ORDER", "ASC", "DESC", "AS", "OF",
      "USING", "RAG", "BETWEEN", "IN", "LIKE", "IS", "NULL", "INSERT",
      "DELETE", "CREATE", "VIEW", "EXPLAIN", "7d", "@snap", "💥", "%%",
      "..", ";", "\"", "\\", "__", "1e309")
    val genSoup = Gen.listOf(fragment).map(_.mkString(" "))
    check(forAll(genSoup) { q =>
      try { Parser.parse(q); true }
      catch {
        case _: Parser.ParseError => true
        case _: Lexer.LexError => true
        case _: Throwable => false
      }
    }, minSuccessful = 300)
  }

  test("interchange roundtrip preserves ids and vector lengths (property_tests.rs:79,286)") {
    check(Prop.forAllNoShrink(genColl) { rows =>
      val dir = java.nio.file.Files.createTempDirectory("prop-jsonl").toString
      val df = rows.toDF("id", "vector")
      graft.sources.Interchange.exportJsonl(df, s"$dir/out")
      val back = graft.sources.Interchange.importJsonl(spark, s"$dir/out")
        .select("id", "vector").as[(String, Array[Float])].collect()
      back.length == rows.length &&
        back.map(_._1).toSet == rows.map(_._1).toSet &&
        back.forall(_._2.length == dim)
    }, minSuccessful = 5)
  }
}
