package graft

import org.apache.spark.sql.functions._

import graft.ann.HalfPrecision._
import graft.functions.Distances

class HalfPrecisionSpec extends SparkSpec {
  import spark.implicits._

  test("f16 scalar conversions: precision, specials, subnormals (float16.rs)") {
    // exact values survive
    Seq(0f, 1f, -1f, 0.5f, 2f, -0.25f, 1024f).foreach { f =>
      assert(halfToFloat(floatToHalf(f)) == f, s"exact $f")
    }
    // ~0.05% relative error for normal range (10-bit mantissa)
    Seq(0.1f, 3.14159f, -123.456f, 0.0077f).foreach { f =>
      val r = halfToFloat(floatToHalf(f))
      assert(math.abs(r - f) / math.abs(f) < 1e-3, s"$f -> $r")
    }
    // overflow to Inf (f16 max ≈ 65504)
    assert(halfToFloat(floatToHalf(1e6f)).isInfinite)
    assert(halfToFloat(floatToHalf(Float.PositiveInfinity)).isPosInfinity)
    assert(halfToFloat(floatToHalf(Float.NaN)).isNaN)
    // subnormal round-trip (f16 subnormals: < 2^-14)
    val sub = 3e-6f
    val r = halfToFloat(floatToHalf(sub))
    assert(r > 0 && math.abs(r - sub) / sub < 0.1, s"subnormal $sub -> $r")
    // deep underflow flushes to zero
    assert(halfToFloat(floatToHalf(1e-9f)) == 0f)
  }

  test("bf16 scalar conversions: f32 exponent range, 7-bit mantissa") {
    Seq(0f, 1f, -2f, 0.5f).foreach { f =>
      assert(bf16ToFloat(floatToBf16(f)) == f)
    }
    // ~0.4% relative error (7-bit mantissa), but full f32 range — no
    // overflow where f16 saturates
    val big = 1e20f
    val r = bf16ToFloat(floatToBf16(big))
    assert(!r.isInfinite && math.abs(r - big) / big < 1e-2)
    Seq(3.14159f, -123.456f).foreach { f =>
      val x = bf16ToFloat(floatToBf16(f))
      assert(math.abs(x - f) / math.abs(f) < 5e-3, s"$f -> $x")
    }
  }

  test("column round-trip halves bytes and keeps distances recall-neutral") {
    val rnd = new scala.util.Random(17)
    val data = (0 until 200).map { i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat * 0.2f))
    }.toDF("id", "v")
    val enc = data.withColumn("h", f16Encode(col("v")))
    // 2 bytes/dim
    assert(enc.select(length(col("h"))).as[Int].head() == 64)
    val dec = enc.withColumn("v2", f16Decode(col("h")))
      .withColumn("d", Distances.cosine(col("v"), col("v2")))
    // decoded vector is essentially the same direction
    assert(dec.agg(max(col("d"))).as[Double].head() < 1e-5)
    // bf16 path too
    val dec2 = data.withColumn("v2", bf16Decode(bf16Encode(col("v"))))
      .withColumn("d", Distances.cosine(col("v"), col("v2")))
    assert(dec2.agg(max(col("d"))).as[Double].head() < 1e-4)
  }

  test("f16 ordering is preserved for top-k at realistic precision") {
    // distances computed on decoded f16 vectors rank the same top-10 as f32
    val rnd = new scala.util.Random(23)
    val data = (0 until 500).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("id", "v")
    val q = Array.fill(16)(rnd.nextGaussian().toFloat)
    def topk(vcol: org.apache.spark.sql.Column) = data
      .withColumn("vv", vcol)
      .withColumn("d", Distances.cosine(col("vv"), lit(q)))
      .orderBy(col("d").asc, col("id").asc).limit(10)
      .select("id").as[Long].collect().toSeq
    val exact = topk(col("v"))
    val viaF16 = topk(f16Decode(f16Encode(col("v"))))
    assert(exact.toSet.intersect(viaF16.toSet).size >= 9)
  }
}
