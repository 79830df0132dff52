package graft

import org.apache.spark.sql.functions._

import graft.text.{Bm25, PorterStemmer, Rrf, Tokenizer}

class PorterStemmerSpec extends SparkSpec {
  private val golden = Seq(
    "running" -> "run", "stemming" -> "stem", "hopping" -> "hop",
    "hoped" -> "hope", "cats" -> "cat", "ties" -> "tie", "cries" -> "cri",
    "ponies" -> "poni", "caresses" -> "caress", "meetings" -> "meet",
    "agreed" -> "agre", "feed" -> "feed", "motoring" -> "motor",
    "argued" -> "argu", "happy" -> "happi", "easily" -> "easili",
    "runner" -> "runner",
    // exceptional forms (Snowball spec)
    "skies" -> "sky", "dying" -> "die", "lying" -> "lie", "news" -> "news",
    "bias" -> "bias", "proceed" -> "proceed", "inning" -> "inning",
    // short words pass through
    "a" -> "a", "is" -> "is", "be" -> "be")

  test("golden stems (Porter2 spec)") {
    golden.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("stemming is idempotent on the testdata vocabulary and injective") {
    import spark.implicits._
    val vocab = sf("documents")
      .select(explode(Tokenizer.tokens(col("text"), stemming = false)).as("t"))
      .distinct().as[String].collect().toSeq
    val stems = vocab.map(PorterStemmer.stem)
    // distinct corpus words keep distinct stems => BM25 stats are isomorphic
    assert(stems.distinct.size == vocab.distinct.size)
  }
}

class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline: lowercase, split, len>1, stopwords, stem") {
    val got = Tokenizer.tokenize("The RUNNING foxes, jumped-over a 42 I lazy dog!")
    assert(got == Seq("run", "fox", "jump", "over", "42", "lazi", "dog"))
  }

  test("column pipeline matches driver-side pipeline") {
    val texts = Seq("Spark queries; run FAST!", "the a I x", "")
    val colRes = texts.toDF("t")
      .select(Tokenizer.tokens(col("t")).as("toks"))
      .as[Seq[String]].collect().toSeq
    assert(colRes == texts.map(Tokenizer.tokenize(_)))
  }
}

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // In-test oracle mirroring the reference formula (src/hybrid.rs:349-416).
  private def bm25(tf: Double, df: Double, n: Double, dl: Double,
                   avgdl: Double, k1: Double = 1.5, b: Double = 0.75): Double = {
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }

  test("scores match the Okapi formula on a hand-built corpus") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick quick dog"),
      (3L, "lazy dog")).toDF("id", "text")
    val ix = Bm25.index(docs, col("id"), col("text"),
      Bm25.Config(stemming = false))
    val got = Bm25.search(ix, "quick dog", 10)
      .as[(Long, Double)].collect().toMap
    val avgdl = 8.0 / 3.0
    val want = Map(
      1L -> bm25(1, 2, 3, 3, avgdl),
      2L -> (bm25(2, 2, 3, 3, avgdl) + bm25(1, 2, 3, 3, avgdl)),
      3L -> (bm25(1, 2, 3, 2, avgdl)))
    want.foreach { case (id, w) => assert(math.abs(got(id) - w) < 1e-12, s"doc $id") }
  }

  test("duplicate query terms count per occurrence; score>0 filter") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("id", "text")
    val ix = Bm25.index(docs, col("id"), col("text"), Bm25.Config(stemming = false))
    val single = Bm25.search(ix, "alpha", 10).as[(Long, Double)].collect().toMap
    val double_ = Bm25.search(ix, "alpha alpha", 10).as[(Long, Double)].collect().toMap
    assert(math.abs(double_(1L) - 2 * single(1L)) < 1e-12)
    assert(!single.contains(2L)) // zero-score docs dropped
  }
}

class RrfSpec extends SparkSpec {
  import spark.implicits._

  test("rrf formula, 1-based ranks, full-outer semantics") {
    val vec = Seq((10L, 0.1), (20L, 0.2), (30L, 0.3)).toDF("id", "distance")
    val bm = Seq((20L, 9.0), (40L, 5.0)).toDF("id", "score")
    val got = Rrf.fuse(vec, bm, Rrf.Config.default, limit = 10)
      .select("id", "rrf_score").as[(Long, Double)].collect().toMap
    def v(r: Int) = 0.5 / (60 + r)
    assert(math.abs(got(10L) - v(1)) < 1e-12)
    assert(math.abs(got(20L) - (v(2) + v(1))) < 1e-12)
    assert(math.abs(got(30L) - v(3)) < 1e-12)
    assert(math.abs(got(40L) - v(2)) < 1e-12)
  }

  test("presets") {
    assert(Rrf.Config.semantic.vectorWeight == 0.7)
    assert(Rrf.Config.keyword.bm25Weight == 0.7)
  }
}

/** Pins the bm25_stemmed fixture's pre-stemmed twin texts to the live
  * tokenizer: the DRIVER gate stays falsifiable because the twins are
  * frozen literals, and this spec makes accidental drift (editing one
  * side of the fixture) a test-time failure instead of a driver-round
  * surprise. A real stemmer change fails BOTH this spec and the gate.
  */
class StemFixtureSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("pinned stemmed twins equal the live tokenizer's stemmed stream") {
    graft.queries.TextQueries.stemFixture.foreach { case (id, raw, twin) =>
      val live = graft.text.Tokenizer.tokenize(raw, stemming = true)
      val pinned = graft.text.Tokenizer.tokenize(twin, stemming = false)
      assert(live == pinned, s"doc $id: live=$live pinned=$pinned")
    }
    assert(graft.text.Tokenizer.tokenize(
      graft.queries.TextQueries.stemQuery, stemming = true) ==
      Seq("run", "poni", "caress"))
  }

  test("no pinned stem is a stop word or single char (filter-order safety)") {
    graft.queries.TextQueries.stemFixture.foreach { case (id, _, twin) =>
      graft.text.Tokenizer.tokenize(twin, stemming = false).foreach { t =>
        assert(t.length > 1, s"doc $id stem '$t'")
        assert(!graft.text.Tokenizer.defaultStopWords.contains(t),
          s"doc $id stem '$t' is a stop word")
      }
    }
  }
}
