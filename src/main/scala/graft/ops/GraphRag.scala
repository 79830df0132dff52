package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** GraphRAG — entity-graph retrieval (SURVEY.md §2.3; reference:
  * src/search/graphrag.rs — entity extraction :188-218, co-occurrence
  * relationships :222-244, hybrid search :329-428, importance :686-722).
  *
  * Spark shape: entities and relationships are tables; extraction is a
  * per-document expression pass; the hybrid search seeds with a vector
  * top-k over entity embeddings and expands by iterative frontier joins,
  * scoring `combined = wv·vector_score(seed) + wg/(1+hop)` and keeping
  * each node's best combination (the reference's BFS with max-merge).
  * Importance is damped power iteration over out-degree-normalized edge
  * weight — all shuffles on entity id.
  *
  * Divergence note: the reference returns the BFS path per result; at
  * scale paths are unbounded strings, so we report hop_count (the path is
  * recoverable via [[SemanticGraph.findPath]] on demand).
  */
object GraphRag {

  /** Capitalized-concept entity extraction (graphrag.rs:188-218): per
    * sentence (". "-split), words beyond the first with length ≥ 2 whose
    * alnum-trimmed form starts uppercase; first occurrence wins. Returns
    * (doc's idCol, entity_id, name) — one row per distinct entity per doc.
    */
  def extractEntities(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val extract = udf((text: String) => {
      if (text == null) Array.empty[String]
      else {
        val seen = scala.collection.mutable.LinkedHashSet[String]()
        text.split("\\. ").foreach { sentence =>
          val words = sentence.split("\\s+").filter(_.nonEmpty)
          words.zipWithIndex.foreach { case (w, i) =>
            if (i != 0 && w.length >= 2) {
              val clean = w.dropWhile(!_.isLetterOrDigit)
                .reverse.dropWhile(!_.isLetterOrDigit).reverse
              if (clean.nonEmpty && clean.head.isUpper) seen += clean
            }
          }
        }
        seen.toArray
      }
    })
    df.select(idCol.as("doc_id"), explode(extract(textCol)).as("name"))
      .withColumn("entity_id", concat(lit("entity_"), lower(col("name"))))
      .select(col("doc_id"), col("entity_id"), col("name"))
  }

  /** Co-occurrence relationships (graphrag.rs:222-244): entities sharing a
    * document, weight = number of co-occurring documents. Directed
    * src < dst (the reference emits each unordered pair once).
    */
  def cooccurrenceEdges(entities: DataFrame): DataFrame =
    entities.select(col("doc_id"), col("entity_id").as("src"))
      .join(entities.select(col("doc_id"), col("entity_id").as("dst")), "doc_id")
      .filter(col("src") < col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("double").as("weight"))

  /** Hybrid vector+graph search (graphrag.rs:329-428). `vectors` holds
    * entity embeddings (id, vector); `edges` is an undirected-intent edge
    * list (expanded both ways here). Scores: vector_score = 1 − d/max(d)
    * over the seed top-k; graph_score = 1/(1+hop); combined =
    * wv·seed_vs + wg·graph_score, max-merged per node.
    */
  def search(vectors: DataFrame, edges: DataFrame, query: Array[Float],
             k: Int, maxHops: Int = 2,
             vectorWeight: Double = 0.7, graphWeight: Double = 0.3,
             metric: String = "cosine", idCol: String = "id",
             vecCol: String = "vector"): DataFrame = {
    val seedsRaw = vectors
      .withColumn("__d", Distances.distance(metric, col(vecCol), lit(query)))
      .orderBy(col("__d").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol).cast("string").as("id"), col("__d"))
      .localCheckpoint(true)
    // empty entity set → empty result (the reference returns Ok(vec![]))
    if (seedsRaw.isEmpty) {
      import vectors.sparkSession.implicits._
      return Seq.empty[(String, Double, Double, Int, Double)]
        .toDF("id", "vector_score", "graph_score", "hop_count", "combined_score")
    }
    val maxD = seedsRaw.agg(max(col("__d"))).collect()(0).getDouble(0) max 1e-6
    var best = seedsRaw
      .withColumn("vector_score", lit(1.0) - col("__d") / maxD)
      .withColumn("graph_score", lit(1.0))
      .withColumn("hop_count", lit(0))
      .withColumn("combined_score",
        lit(vectorWeight) * col("vector_score") + lit(graphWeight))
      .drop("__d")
      .localCheckpoint(true)
    val undirected = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var frontier = best.select(col("id"), col("vector_score"))
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val g = 1.0 / (1.0 + hop)
      val expanded = undirected
        .join(frontier.select(col("id").as("src"), col("vector_score")), "src")
        .select(col("dst").cast("string").as("id"), col("vector_score"))
        // best seed per reached node this hop
        .groupBy("id").agg(max(col("vector_score")).as("vector_score"))
        .withColumn("graph_score", lit(g))
        .withColumn("hop_count", lit(hop))
        .withColumn("combined_score",
          lit(vectorWeight) * col("vector_score") + lit(graphWeight) * g)
        .localCheckpoint(true)
      // max-merge into the running best (keep highest combined per id)
      val merged = best.unionByName(expanded)
        .withColumn("__r", row_number().over(Window.partitionBy(col("id"))
          .orderBy(col("combined_score").desc, col("hop_count").asc)))
        .filter(col("__r") === 1).drop("__r")
        .localCheckpoint(true)
      // expand next from newly-reached nodes only
      frontier = expanded.join(best.select("id"), Seq("id"), "left_anti")
        .select(col("id"), col("vector_score"))
      best = merged
    }
    best.orderBy(col("combined_score").desc, col("id").asc).limit(k)
  }

  /** Damped importance power-iteration (graphrag.rs:686-722) — PageRank
    * over the co-occurrence graph: imp = (1−d)/N + d·Σ_in imp/outdeg.
    */
  def importance(edges: DataFrame, iterations: Int = 10,
                 damping: Double = 0.85): DataFrame = {
    val undirected = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    val nodes = undirected.select(col("src").as("id")).distinct()
      .localCheckpoint(true)
    val n = nodes.count().toDouble
    val outDeg = undirected.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("__deg")).localCheckpoint(true)
    var imp = nodes.withColumn("importance", lit(1.0 / n)).localCheckpoint(true)
    (1 to iterations).foreach { _ =>
      val contrib = undirected
        .join(imp.select(col("id").as("src"), col("importance")), "src")
        .join(outDeg, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("importance") / col("__deg")).as("__in"))
      imp = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("importance"))
        .localCheckpoint(true)
    }
    imp.orderBy(col("importance").desc, col("id").asc)
  }
}
