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
}
