package graft

import org.apache.spark.sql.functions._

import graft.ann.DimReduce

class DimReduceSpec extends SparkSpec {
  import spark.implicits._

  // anisotropic cloud: variance along (1,1,0)/√2 dominates
  private def cloud = {
    val rnd = new scala.util.Random(11)
    (0 until 400).map { i =>
      val t = rnd.nextGaussian() * 5
      val (nx, ny, nz) = (rnd.nextGaussian() * 0.2, rnd.nextGaussian() * 0.2,
        rnd.nextGaussian() * 0.2)
      (i.toLong, Array((t + nx).toFloat, (t + ny).toFloat, nz.toFloat))
    }.toDF("id", "v")
  }

  test("PCA finds the dominant direction; components orthonormal; ratios descend") {
    val pca = DimReduce.fitPca(cloud, col("v"), nComponents = 2)
    val c0 = pca.components(0).map(_.toDouble)
    // dominant direction ≈ ±(1,1,0)/√2
    assert(math.abs(math.abs(c0(0)) - math.sqrt(0.5)) < 0.05)
    assert(math.abs(math.abs(c0(1)) - math.sqrt(0.5)) < 0.05)
    assert(math.abs(c0(2)) < 0.1)
    // orthonormal
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(math.abs(dot(pca.components(0), pca.components(0)) - 1.0) < 1e-4)
    assert(math.abs(dot(pca.components(0), pca.components(1))) < 1e-4)
    // descending, bounded ratios
    val r = pca.explainedVarianceRatio
    assert(r(0) >= r(1) && r(0) > 0.9 && r.forall(x => x >= 0 && x <= 1.0001))
  }

  test("transform + inverse reconstructs within the discarded variance") {
    val pca = DimReduce.fitPca(cloud, col("v"), nComponents = 2)
    val v = Array(3f, 3.1f, 0.05f)
    val rec = pca.inverseTransformOne(pca.transformOne(v))
    val err = math.sqrt(v.zip(rec).map { case (a, b) =>
      (a - b).toDouble * (a - b) }.sum)
    assert(err < 0.5, s"reconstruction error $err")
  }

  test("distributed transform column matches the driver-side projection") {
    val pca = DimReduce.fitPca(cloud, col("v"), nComponents = 2)
    val got = cloud.withColumn("y", pca.transform(col("v")))
      .select("id", "v", "y").as[(Long, Seq[Float], Seq[Float])]
      .collect()
    got.take(20).foreach { case (_, v, y) =>
      val expect = pca.transformOne(v.toArray)
      assert(y.zip(expect).forall { case (a, b) => math.abs(a - b) < 1e-5 })
    }
    assert(got.forall(_._3.size == 2))
  }

  test("random projection approximately preserves relative distances (JL)") {
    val rp = DimReduce.RandomProjection(inputDims = 64, outputDims = 16)
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    def d(a: Array[Float], b: Array[Float]) = math.sqrt(
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
    val pairs = (0 until 30).map(_ => (vec(), vec()))
    val ratios = pairs.map { case (a, b) =>
      d(rp.projectOne(a), rp.projectOne(b)) / d(a, b)
    }
    // distortion concentrated around 1 (16 dims: loose bounds)
    assert(ratios.forall(r => r > 0.5 && r < 1.6), ratios.mkString(","))
    val meanR = ratios.sum / ratios.size
    assert(math.abs(meanR - 1.0) < 0.2, s"mean ratio $meanR")
  }

  test("sparse (Achlioptas) projection: ±√(3/k)/0 entries at 1/6-2/3-1/6, " +
      "deterministic per seed, JL distortion bounded") {
    val sp = DimReduce.SparseProjection(inputDims = 64, outputDims = 16)
    val again = DimReduce.SparseProjection(64, 16)
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val a = vec(); val b = vec()
    assert(sp.projectOne(a).toSeq == again.projectOne(a).toSeq)
    def d(x: Array[Float], y: Array[Float]) = math.sqrt(
      x.zip(y).map { case (p, q) => (p - q).toDouble * (p - q) }.sum)
    val ratios = (0 until 30).map { _ =>
      val (x, y) = (vec(), vec()); d(sp.projectOne(x), sp.projectOne(y)) / d(x, y)
    }
    assert(math.abs(ratios.sum / ratios.size - 1.0) < 0.25)
    // entry distribution: only the three legal values, zeros dominate
    val scale = math.sqrt(3.0 / 16).toFloat
    val entries = (0 until 16).flatMap(r =>
      sp.projectOne(Array.tabulate(64)(i => if (i == r * 4) 1f else 0f)))
    assert(entries.forall(e => e == 0f || math.abs(math.abs(e) - scale) < 1e-6f))
  }

  test("findOptimalComponents walks the cumulative variance ratio " +
      "(dimreduce.rs:606-623)") {
    // the anisotropic cloud: one dominant direction explains ≥ 90%
    assert(DimReduce.findOptimalComponents(cloud, col("v"), 0.9f) == 1)
    // demanding everything forces more components (2 captures the noise
    // floor split across the two minor axes or falls back to the max)
    val all = DimReduce.findOptimalComponents(cloud, col("v"), 0.9999f)
    assert(all >= 2 && all <= 3)
    intercept[IllegalArgumentException](DimReduce.findOptimalComponents(
      cloud.filter(col("id") < 0), col("v"), 0.9f))
  }

  test("neighbor embedding separates two planted clusters and centers " +
      "its output; the DF front-end enforces the driver bound") {
    val rnd = new scala.util.Random(3)
    val pts = (0 until 40).map { i =>
      val base = if (i < 20) 0f else 30f
      (i.toLong, Array.fill(8)(base + rnd.nextGaussian().toFloat * 0.5f))
    }
    val ne = DimReduce.NeighborEmbedding(outputDims = 2, perplexity = 10f,
      nIter = 300)
    val y = ne.fitTransform(pts.map(_._2).toArray)
    assert(y.length == 40 && y.forall(_.length == 2))
    // deterministic per seed
    assert(ne.fitTransform(pts.map(_._2).toArray).map(_.toSeq).toSeq ==
      y.map(_.toSeq).toSeq)
    // centered
    assert(math.abs(y.map(_(0).toDouble).sum / 40) < 1e-3)
    // planted clusters land closer to their own side than to the other:
    // compare mean intra- vs inter-cluster embedded distance
    def d(a: Array[Float], b: Array[Float]) = math.sqrt(
      a.zip(b).map { case (p, q) => (p - q).toDouble * (p - q) }.sum)
    val (c1, c2) = y.splitAt(20)
    val intra = (c1.combinations(2).map(p => d(p(0), p(1))) ++
      c2.combinations(2).map(p => d(p(0), p(1)))).toSeq
    val inter = (for (a <- c1; b <- c2) yield d(a, b)).toSeq
    assert(intra.sum / intra.size < inter.sum / inter.size,
      s"intra ${intra.sum / intra.size} vs inter ${inter.sum / inter.size}")
    // DF front-end round-trips ids and enforces its bound
    val df = pts.toDF("id", "v")
    val out = ne.fitTransformDf(df, col("id"), col("v"))
    assert(out.count() == 40 && out.columns.toSeq == Seq("id", "y"))
    intercept[IllegalArgumentException](
      ne.fitTransformDf(df, col("id"), col("v"), maxDriverRows = 10))
  }
}
