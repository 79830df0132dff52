package graft.ann;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD distance kernels over the packed row-major float layout
 * (jdk.incubator.vector, Java 17 incubator module). These are the
 * opt-in SERVING kernels: accumulation is f32 in vector lanes, so sums
 * are NOT bit-identical to the f64 scalar kernels the oracle-gated
 * paths use (Ivf.flatScoreKernel) — the serving contract is recall
 * against the exact result, not score identity, which is also the
 * contract the reference's SIMD engine offers (reference
 * src/simd_basic.rs, simd_advanced.rs: f32 lane accumulation with a
 * horizontal reduce at the end — same numerics as here).
 *
 * Availability is runtime-probed (graft.ann.Simd): the incubator module
 * must be on the JVM's --add-modules. When absent, class resolution
 * fails and callers fall back to the scalar kernels — per-JVM, so a
 * mixed cluster degrades gracefully.
 *
 * All public signatures are primitives-only on purpose: with
 * CompileOrder.JavaThenScala, scalac reads this as a classfile and
 * never needs to resolve the incubator types.
 */
public final class VectorSimd {
  private static final VectorSpecies<Float> SF = FloatVector.SPECIES_PREFERRED;

  private VectorSimd() {}

  /** Availability probe: exercises the vector pipeline end to end. */
  public static float probe() {
    float[] a = {1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f};
    float[] b = {8f, 7f, 6f, 5f, 4f, 3f, 2f, 1f};
    return dot(a, 0, 8, b); // 8+14+18+20+20+18+14+8 = 120
  }

  /** f32 dot product; two FMA accumulator chains to cover FMA latency. */
  public static float dot(float[] vs, int off, int dims, float[] q) {
    int i = 0;
    int step = SF.length();
    FloatVector a0 = FloatVector.zero(SF), a1 = FloatVector.zero(SF);
    for (; i <= dims - 2 * step; i += 2 * step) {
      a0 = FloatVector.fromArray(SF, vs, off + i)
          .fma(FloatVector.fromArray(SF, q, i), a0);
      a1 = FloatVector.fromArray(SF, vs, off + i + step)
          .fma(FloatVector.fromArray(SF, q, i + step), a1);
    }
    for (; i <= dims - step; i += step)
      a0 = FloatVector.fromArray(SF, vs, off + i)
          .fma(FloatVector.fromArray(SF, q, i), a0);
    float s = a0.add(a1).reduceLanes(VectorOperators.ADD);
    for (; i < dims; i++) s += vs[off + i] * q[i];
    return s;
  }

  /** f32 squared euclidean distance. */
  public static float sqEuclidean(float[] vs, int off, int dims, float[] q) {
    int i = 0;
    int step = SF.length();
    FloatVector a0 = FloatVector.zero(SF), a1 = FloatVector.zero(SF);
    for (; i <= dims - 2 * step; i += 2 * step) {
      FloatVector d0 = FloatVector.fromArray(SF, vs, off + i)
          .sub(FloatVector.fromArray(SF, q, i));
      FloatVector d1 = FloatVector.fromArray(SF, vs, off + i + step)
          .sub(FloatVector.fromArray(SF, q, i + step));
      a0 = d0.fma(d0, a0);
      a1 = d1.fma(d1, a1);
    }
    for (; i <= dims - step; i += step) {
      FloatVector d = FloatVector.fromArray(SF, vs, off + i)
          .sub(FloatVector.fromArray(SF, q, i));
      a0 = d.fma(d, a0);
    }
    float s = a0.add(a1).reduceLanes(VectorOperators.ADD);
    for (; i < dims; i++) {
      float d = vs[off + i] - q[i];
      s += d * d;
    }
    return s;
  }

  /** f32 L1 distance. */
  public static float manhattan(float[] vs, int off, int dims, float[] q) {
    int i = 0;
    int step = SF.length();
    FloatVector a0 = FloatVector.zero(SF), a1 = FloatVector.zero(SF);
    for (; i <= dims - 2 * step; i += 2 * step) {
      a0 = a0.add(FloatVector.fromArray(SF, vs, off + i)
          .sub(FloatVector.fromArray(SF, q, i)).abs());
      a1 = a1.add(FloatVector.fromArray(SF, vs, off + i + step)
          .sub(FloatVector.fromArray(SF, q, i + step)).abs());
    }
    for (; i <= dims - step; i += step)
      a0 = a0.add(FloatVector.fromArray(SF, vs, off + i)
          .sub(FloatVector.fromArray(SF, q, i)).abs());
    float s = a0.add(a1).reduceLanes(VectorOperators.ADD);
    for (; i < dims; i++) s += Math.abs(vs[off + i] - q[i]);
    return s;
  }

  /** f32 L∞ distance — max is order-insensitive, so this matches the
   * scalar kernel except for the 1-ulp (f32 sub vs f64 sub) difference. */
  public static float chebyshev(float[] vs, int off, int dims, float[] q) {
    int i = 0;
    int step = SF.length();
    FloatVector m = FloatVector.zero(SF);
    for (; i <= dims - step; i += step)
      m = m.max(FloatVector.fromArray(SF, vs, off + i)
          .sub(FloatVector.fromArray(SF, q, i)).abs());
    float s = m.reduceLanes(VectorOperators.MAX);
    for (; i < dims; i++) {
      float d = Math.abs(vs[off + i] - q[i]);
      if (d > s) s = d;
    }
    return s;
  }

  /** Exact mismatch count — integer semantics, identical to scalar. */
  public static int hamming(float[] vs, int off, int dims, float[] q) {
    int i = 0;
    int step = SF.length();
    int c = 0;
    for (; i <= dims - step; i += step)
      c += FloatVector.fromArray(SF, vs, off + i)
          .compare(VectorOperators.NE, FloatVector.fromArray(SF, q, i))
          .trueCount();
    for (; i < dims; i++) if (vs[off + i] != q[i]) c++;
    return c;
  }
}
