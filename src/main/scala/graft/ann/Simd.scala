package graft.ann

/** Runtime gate + kernel table for the SIMD serving kernels
  * ([[VectorSimd]]). The incubator module (`jdk.incubator.vector`) must
  * be resolved into the JVM (`--add-modules jdk.incubator.vector` —
  * build.sbt adds it to every forked JVM; clusters add it to
  * `spark.executor.extraJavaOptions`). When it isn't, the probe throws
  * `NoClassDefFoundError` (a LinkageError, deliberately caught as
  * `Throwable` — `scala.util.Try` would let it through) and every
  * caller silently keeps the scalar f64 kernel, per JVM.
  */
object Simd {

  /** Whether the vector module is resolvable in THIS JVM. Evaluated
    * once per JVM (executors re-evaluate independently).
    */
  lazy val available: Boolean =
    try VectorSimd.probe() == 120f
    catch { case _: Throwable => false }

  /** f32 SIMD analogue of [[Ivf.flatScoreKernel]] — same (vs, off,
    * dims, q, vn2, qn2) => distance signature, same distance direction
    * and zero-vector conventions, f32 lane accumulation. None for
    * metrics with no SIMD form (callers fall back to scalar).
    */
  def flatKernel(metric: String)
      : Option[(Array[Float], Int, Int, Array[Float], Double, Double) => Double] =
    metric match {
      case "cosine" => Some { (vs, off, dims, q, vn2, qn2) =>
        if (vn2 == 0.0 || qn2 == 0.0) 1.0
        else 1.0 - VectorSimd.dot(vs, off, dims, q) /
          (math.sqrt(vn2) * math.sqrt(qn2))
      }
      case "cosine_normalized" => Some { (vs, off, dims, q, _, _) =>
        1.0 - VectorSimd.dot(vs, off, dims, q).toDouble
      }
      case "dot" => Some { (vs, off, dims, q, _, _) =>
        -VectorSimd.dot(vs, off, dims, q).toDouble
      }
      case "euclidean" => Some { (vs, off, dims, q, _, _) =>
        math.sqrt(VectorSimd.sqEuclidean(vs, off, dims, q).toDouble)
      }
      case "sq_euclidean" => Some { (vs, off, dims, q, _, _) =>
        VectorSimd.sqEuclidean(vs, off, dims, q).toDouble
      }
      case "manhattan" => Some { (vs, off, dims, q, _, _) =>
        VectorSimd.manhattan(vs, off, dims, q).toDouble
      }
      case "chebyshev" => Some { (vs, off, dims, q, _, _) =>
        VectorSimd.chebyshev(vs, off, dims, q).toDouble
      }
      case "hamming" => Some { (vs, off, dims, q, _, _) =>
        VectorSimd.hamming(vs, off, dims, q).toDouble
      }
      case _ => None
    }
}
