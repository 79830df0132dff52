package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Half-precision vector storage (reference: src/indexing/float16.rs —
  * F16 :32-170, Bf16 :173-260): completes the compression ladder between
  * full f32 and the lossy quantizers (fp16/bf16 2×, SQ8 4×, PQ ~dims/M×,
  * binary 32×). Vectors encode to a BINARY column of 2 bytes/dim
  * (little-endian); decode restores ARRAY<FLOAT> for the existing distance
  * kernels. IEEE 754 half: truncating mantissa conversion, subnormal and
  * Inf/NaN handling per the reference; bf16: upper 16 bits of the f32
  * pattern (same exponent range as f32, 7-bit mantissa).
  *
  * Scale note: at 100 TB a 2× byte reduction on the dominant column is a
  * 2× scan-bandwidth and cache-footprint win with ≲0.05% per-component
  * error (f16 on unit-normalized embeddings) — usually recall-neutral,
  * unlike the coarser quantizers which need a re-rank phase.
  */
object HalfPrecision {

  /** f32 → IEEE 754 binary16 bit pattern (float16.rs:61-98). */
  def floatToHalf(value: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(value)
    val sign = (bits >>> 31) & 1
    val exp = (bits >>> 23) & 0xFF
    val mantissa = bits & 0x7FFFFF
    if (exp == 255) { // Inf / NaN
      if (mantissa == 0) ((sign << 15) | 0x7C00).toShort
      else ((sign << 15) | 0x7E00).toShort
    } else {
      val newExp = exp - 127 + 15
      if (newExp <= 0) {
        if (newExp < -10) (sign << 15).toShort // underflow to signed zero
        else { // subnormal
          val m = (mantissa | 0x800000) >>> (1 - newExp + 13)
          ((sign << 15) | m).toShort
        }
      } else if (newExp >= 31) ((sign << 15) | 0x7C00).toShort // overflow
      else ((sign << 15) | (newExp << 10) | (mantissa >>> 13)).toShort
    }
  }

  /** binary16 bit pattern → f32 (float16.rs:101-137). */
  def halfToFloat(half: Short): Float = {
    val bits = half & 0xFFFF
    val sign = (bits >>> 15) & 1
    val exp = (bits >>> 10) & 0x1F
    val mantissa = bits & 0x3FF
    if (exp == 0) {
      if (mantissa == 0) java.lang.Float.intBitsToFloat(sign << 31)
      else { // subnormal: normalize
        var m = mantissa
        var e = 1
        while ((m & 0x400) == 0) { m <<= 1; e -= 1 }
        val newExp = 127 - 15 + e
        java.lang.Float.intBitsToFloat(
          (sign << 31) | (newExp << 23) | ((m & 0x3FF) << 13))
      }
    } else if (exp == 31) {
      if (mantissa == 0) java.lang.Float.intBitsToFloat((sign << 31) | 0x7F800000)
      else Float.NaN
    } else {
      java.lang.Float.intBitsToFloat(
        (sign << 31) | ((exp - 15 + 127) << 23) | (mantissa << 13))
    }
  }

  /** f32 → bfloat16 with round-to-nearest-even (float16.rs:209-219). */
  def floatToBf16(value: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(value)
    val round = (bits >>> 15) & 1
    val sticky = (bits & 0x7FFF) != 0
    val upper = (bits >>> 16).toShort
    if (round != 0 && (sticky || (upper & 1) != 0)) (upper + 1).toShort
    else upper
  }

  def bf16ToFloat(h: Short): Float =
    java.lang.Float.intBitsToFloat((h & 0xFFFF) << 16)

  private def encodeWith(conv: Float => Short) = udf((v: Seq[Float]) =>
    if (v == null) null
    else {
      val out = new Array[Byte](v.length * 2)
      var i = 0
      v.foreach { f =>
        val h = conv(f)
        out(i) = (h & 0xFF).toByte
        out(i + 1) = ((h >>> 8) & 0xFF).toByte
        i += 2
      }
      out
    })

  private def decodeWith(conv: Short => Float) = udf((b: Array[Byte]) =>
    if (b == null) null
    else {
      val out = new Array[Float](b.length / 2)
      var i = 0
      while (i < out.length) {
        val h = ((b(2 * i) & 0xFF) | ((b(2 * i + 1) & 0xFF) << 8)).toShort
        out(i) = conv(h)
        i += 1
      }
      out
    })

  /** ARRAY&lt;FLOAT&gt; → 2-bytes/dim BINARY (IEEE binary16). */
  def f16Encode(vecCol: Column): Column = encodeWith(floatToHalf)(vecCol)
  def f16Decode(binCol: Column): Column = decodeWith(halfToFloat)(binCol)

  /** ARRAY&lt;FLOAT&gt; → 2-bytes/dim BINARY (bfloat16, round-to-nearest). */
  def bf16Encode(vecCol: Column): Column = encodeWith(floatToBf16)(vecCol)
  def bf16Decode(binCol: Column): Column = decodeWith(bf16ToFloat)(binCol)
}
