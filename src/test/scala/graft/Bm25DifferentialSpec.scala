package graft

import org.apache.spark.sql.functions._

import graft.text.Bm25

/** Randomized differential for BM25 incremental maintenance: any sequence
  * of add/replace/remove batches must leave the index equal to a fresh
  * build over the surviving document set — same postings, same corpus
  * stats, same search scores. Complements Bm25IncrementalSpec's pointwise
  * case with random op sequences, replacements included (same-id add must
  * drop the OLD posting set, the classic incremental-index bug).
  */
class Bm25DifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val words = Vector("spark", "index", "vector", "query", "search",
    "engine", "data", "join", "shuffle", "scan", "merge", "filter")

  private def doc(rnd: scala.util.Random, salt: Int): String =
    (Seq.fill(3 + rnd.nextInt(8))(words(rnd.nextInt(words.length))) :+
      s"u$salt").mkString(" ")

  for (seed <- Seq(17, 29))
    test(s"incremental add/replace/remove == fresh rebuild (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      // live = the ground-truth surviving corpus
      val live = scala.collection.mutable.LinkedHashMap[Long, String]()
      var ix = Bm25.index(Seq.empty[(Long, String)].toDF("id", "text"),
        col("id"), col("text"))
      for (step <- 0 until 8) {
        if (rnd.nextInt(4) == 0 && live.nonEmpty) {
          val victims = rnd.shuffle(live.keys.toVector).take(1 + rnd.nextInt(2))
          victims.foreach(live.remove)
          ix = Bm25.removeDocuments(ix, victims.toDF("doc_id"))
        } else {
          // mixture of fresh ids and REPLACEMENTS of existing ones
          val batch = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = if (rnd.nextBoolean() && live.nonEmpty)
              rnd.shuffle(live.keys.toVector).head
            else rnd.nextInt(40).toLong
            id -> doc(rnd, step * 100 + rnd.nextInt(100))
          }.toMap
          batch.foreach { case (k, v) => live(k) = v }
          ix = Bm25.addDocuments(ix, batch.toSeq.toDF("id", "text"),
            col("id"), col("text"))
        }
      }
      val fresh = Bm25.index(live.toSeq.toDF("id", "text"), col("id"), col("text"))

      def postings(i: Bm25.Index) = i.termFreqs
        .select("doc_id", "term", "tf", "dl").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      assert(postings(ix) == postings(fresh), "posting sets diverged")

      def stats(i: Bm25.Index): (Double, Double) = {
        val r = i.corpus.collect().head
        (r.getDouble(0), r.getDouble(1))
      }
      val (n1, avg1) = stats(ix); val (n2, avg2) = stats(fresh)
      assert(n1 == n2 && math.abs(avg1 - avg2) < 1e-12,
        s"corpus stats diverged: ($n1,$avg1) vs ($n2,$avg2)")

      val q = words(rnd.nextInt(words.length)) + " " + words(rnd.nextInt(words.length))
      def top(i: Bm25.Index) = Bm25.search(i, q, 10).collect()
        .map(r => (r.get(0), math.rint(r.getDouble(1) * 1e9) / 1e9)).toSeq
      assert(top(ix) == top(fresh), s"search('$q') diverged")
    }
}
