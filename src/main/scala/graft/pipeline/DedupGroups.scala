package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-group resolution (reference: src/experimental/dedup.rs —
  * DuplicateGroup :354, generate_dedup_report :482, get_ids_to_remove
  * :526): turn near-duplicate PAIRS (from any of the Dedup family's
  * candidate generators) into groups, report statistics, and pick removal
  * victims per strategy.
  *
  * Group formation is exact connected components over the pair edge list —
  * iterative min-label propagation. Duplicate clusters are near-cliques,
  * so convergence takes 2-4 supersteps, and every shuffle is bounded by
  * the PAIR list (tiny), never the corpus. The reference walks groups
  * sequentially in memory; the canonical member here is the MINIMUM id
  * (its "first added" insertion order has no distributed meaning).
  */
object DedupGroups {

  /** (id, canonical) for every id in `pairs`: exact connected components
    * via min-label propagation, iterated to fixpoint.
    *
    * Pair lists whose DOUBLED (undirected, deduped) edge count is at or
    * below `smallGraphThreshold` take a driver-side union-find fast path
    * instead — so the threshold effectively applies at ~2× the input pair
    * count. Identical output (the canonical is still the component
    * minimum), but one collect + one parallelize in place of 2-4
    * supersteps × (2 joins + a convergence count), which dominate wall
    * time when the pair list is small. Duplicate-pair lists are bounded by
    * the candidate generators (banding/rare-shingle caps), so even 100 TB
    * corpora commonly land under the default 1M-edge bound; the superstep
    * loop remains the exact path for anything larger.
    */
  def components(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                 maxIterations: Int = 50,
                 smallGraphThreshold: Long = 1L << 20): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
    val undirected = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true) // cut the candidate-generation plan once
    if (undirected.count() <= smallGraphThreshold)
      return componentsLocal(undirected)
    var labels = undirected.select(col("src").as("id")).distinct()
      .withColumn("canonical", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (iter < maxIterations && changed > 0) {
      iter += 1
      val neighborMin = undirected
        .join(labels.select(col("id").as("src"), col("canonical")), "src")
        .groupBy(col("dst")).agg(min(col("canonical")).as("__nmin"))
        .select(col("dst").as("id"), col("__nmin"))
      // the old label rides along so the convergence check needs no
      // extra join against the previous superstep
      val viaNeighbors = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("canonical").as("__old"),
          least(col("canonical"), coalesce(col("__nmin"), col("canonical")))
            .as("canonical"))
      // pointer jumping (path halving): adopt the canonical's canonical —
      // turns the O(diameter) chain worst case into O(log diameter)
      val jumped = viaNeighbors.as("a")
        .join(viaNeighbors.select(col("id").as("canonical"),
          col("canonical").as("__cc")).as("b"), Seq("canonical"), "left")
        .select(col("id"), col("__old"),
          least(col("canonical"), coalesce(col("__cc"), col("canonical")))
            .as("canonical"))
        .localCheckpoint(true) // pin each superstep; lineage stays O(1)
      changed = jumped.filter(col("canonical") =!= col("__old")).count()
      labels = jumped.select(col("id"), col("canonical"))
    }
    labels
  }

  /** Driver-side union-find over a collected edge list (small-graph fast
    * path): union by the id column's natural ordering so the root of every
    * component is its minimum — exactly what min-label propagation
    * converges to.
    */
  private def componentsLocal(undirected: DataFrame): DataFrame = {
    val spark = undirected.sparkSession
    val idType = undirected.schema.fields.head.dataType
    // Must match the distributed path's Spark min/least ordering exactly,
    // or the chosen canonical would depend on smallGraphThreshold: Spark
    // compares strings as unsigned UTF-8 bytes (UTF8String), NOT Java's
    // UTF-16 compareTo (they disagree for supplementary characters vs
    // [U+E000, U+FFFF]); other id types are restricted to the numeric
    // primitives whose orderings agree everywhere.
    def utf8Compare(x: String, y: String): Int = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
    val ord: Ordering[Any] = new Ordering[Any] {
      def compare(a: Any, b: Any): Int = (a, b) match {
        case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
        case (x: Int, y: Int)       => Integer.compare(x, y)
        case (x: Short, y: Short)   => java.lang.Short.compare(x, y)
        case (x: Byte, y: Byte)     => java.lang.Byte.compare(x, y)
        case (x: String, y: String) => utf8Compare(x, y)
        case (x: Double, y: Double) => java.lang.Double.compare(x, y)
        case (x: Float, y: Float)   => java.lang.Float.compare(x, y)
        case _ => throw new IllegalArgumentException(
          s"componentsLocal: unsupported id type ${a.getClass.getName}; " +
            "use long/int/string ids (or raise smallGraphThreshold to 0 " +
            "to force the distributed path)")
      }
    }
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val ids = scala.collection.mutable.LinkedHashSet.empty[Any]
    undirected.collect().foreach { row =>
      val u = row.get(0)
      val v = row.get(1)
      ids += u; ids += v
      val (a, b) = (find(u), find(v))
      if (a != b) {
        if (ord.lt(a, b)) parent(b) = a else parent(a) = b
      }
    }
    val rows = ids.toSeq.map(id =>
      org.apache.spark.sql.Row(id, find(id)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType, nullable = false),
      org.apache.spark.sql.types.StructField("canonical", idType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** DuplicateGroup rows (dedup.rs:354-361): (canonical, members sorted,
    * n_members, avg_similarity within the group's observed pairs).
    */
  def groups(pairs: DataFrame, simCol: Column,
             idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val comp = components(pairs, idA, idB).localCheckpoint(true)
    val membership = comp.groupBy(col("canonical"))
      .agg(sort_array(collect_list(col("id"))).as("members"),
        count(lit(1)).as("n_members"))
    val sims = pairs.select(col(idA).as("id"), simCol.as("__sim"))
      .join(comp, "id")
      .groupBy(col("canonical"))
      .agg(avg(col("__sim")).as("avg_similarity"),
        min(col("__sim")).as("__min_sim"))
    membership.join(sims, "canonical")
  }

  /** One-row DeduplicationReport (dedup.rs:466-513). The reference stubs
    * exact_duplicates to 0 (its comment: "would need to track this
    * separately"); here a group counts as exact when every observed pair
    * similarity is 1.0.
    */
  def report(pairs: DataFrame, simCol: Column, totalVectors: Long,
             idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    groups(pairs, simCol, idA, idB)
      .agg(
        lit(totalVectors).as("total_vectors"),
        count(lit(1)).as("num_groups"),
        coalesce(sum(col("n_members") - 1), lit(0L)).as("num_duplicates"),
        coalesce(sum(when(col("__min_sim") >= 1.0, col("n_members") - 1)
          .otherwise(0L)), lit(0L)).as("exact_duplicates"),
        coalesce(sum(when(col("__min_sim") < 1.0, col("n_members") - 1)
          .otherwise(0L)), lit(0L)).as("near_duplicates"))
  }

  sealed trait Strategy
  object Strategy {
    /** Keep the minimum id (the canonical). */
    case object KeepFirst extends Strategy
    /** Keep the maximum id. */
    case object KeepLatest extends Strategy
    /** Keep the member with the highest `richness`; ties → smaller id.
      * (The reference declares this strategy but falls back to first —
      * dedup.rs:545; here it is honored when a richness table is given.)
      */
    final case class KeepRichest(richness: DataFrame) extends Strategy
  }

  /** Ids to remove (dedup.rs:526-553): every group member except the
    * strategy's keeper.
    */
  def idsToRemove(pairs: DataFrame, strategy: Strategy,
                  idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val comp = components(pairs, idA, idB)
    val keeper = strategy match {
      case Strategy.KeepFirst =>
        comp.groupBy(col("canonical")).agg(min(col("id")).as("__keep"))
      case Strategy.KeepLatest =>
        comp.groupBy(col("canonical")).agg(max(col("id")).as("__keep"))
      case Strategy.KeepRichest(rich) =>
        import org.apache.spark.sql.expressions.Window
        comp.join(rich.toDF("id", "__richness"), Seq("id"), "left")
          .withColumn("__r", row_number().over(
            Window.partitionBy(col("canonical"))
              .orderBy(coalesce(col("__richness"), lit(0.0)).desc, col("id").asc)))
          .filter(col("__r") === 1)
          .select(col("canonical"), col("id").as("__keep"))
    }
    comp.join(keeper, "canonical")
      .filter(col("id") =!= col("__keep"))
      .select(col("id"))
  }
}
