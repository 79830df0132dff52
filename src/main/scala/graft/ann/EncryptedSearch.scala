package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encrypted (hash-only) vector search (reference: src/services/search/
  * encrypted_search.rs): vectors are stored ONLY as packed sign-of-dot
  * LSH codes against a seeded hyperplane family, and search compares
  * Hamming distance between code words — the plaintext vector never
  * leaves the encoder. `estimated_similarity = 1 - hamming / totalBits`
  * (encrypted_search.rs:115-131).
  *
  * Spark shape: encoding is one fused per-row pass (a single compiled
  * UDF over the plaintext column — the hyperplane family rides the
  * closure, ~256×dims floats); the encoded frame carries only
  * `(id, hash_codes array<long>, original_norm)` and can be persisted
  * WITHOUT the plaintext. Search is a pure-expression Hamming scan
  * (`zip_with` + XOR + `bit_count`) feeding TakeOrderedAndProject —
  * codegen end to end, no join, k-bounded output.
  *
  * Numeric note: sign-of-dot is computed in f64 (the reference uses f32,
  * encrypted_search.rs:203); the hyperplane GENERATOR keeps exact f32 +
  * wrapping-u64 LCG parity with encrypted_search.rs:217-230.
  */
object EncryptedSearch {

  /** encrypted_search.rs:27-48 */
  final case class Config(dimensions: Int, hashBits: Int,
                          numTables: Int = 4, seed: Long = 42L) {
    def totalBits: Int = hashBits * numTables
  }

  /** encrypted_search.rs:50-70 + the preset table numbers (:141-157) */
  sealed abstract class SecurityLevel(val tables: Int) {
    def hashBits(dimensions: Int): Int
  }
  object SecurityLevel {
    case object Standard extends SecurityLevel(2) {
      def hashBits(d: Int): Int = d.min(64)
    }
    case object High extends SecurityLevel(4) {
      def hashBits(d: Int): Int = d.min(128)
    }
    case object Maximum extends SecurityLevel(8) {
      def hashBits(d: Int): Int = d.min(256)
    }
    def config(dimensions: Int, level: SecurityLevel): Config =
      Config(dimensions, level.hashBits(dimensions), level.tables)
  }

  /** Seeded hyperplane family — exact parity with the reference's
    * wrapping-u64 LCG and f32 mapping (encrypted_search.rs:217-230):
    * `state = state * 6364136223846793005 + 1442695040888963407`,
    * value = `((state >> 33) as f32 / u32::MAX as f32) * 2 - 1`.
    */
  def generateHyperplanes(dims: Int, count: Int,
                          seed: Long): Array[Array[Float]] = {
    var state = seed
    Array.fill(count) {
      Array.fill(dims) {
        state = state * 6364136223846793005L + 1442695040888963407L
        ((state >>> 33).toFloat / 4294967295f) * 2.0f - 1.0f
      }
    }
  }

  /** Driver-side encoder for a query vector (encrypted_search.rs:196-211):
    * bit j of the packed little-endian code words is the sign of
    * `dot(vector, hyperplane_j)`, accumulated in f64.
    */
  def encodeOne(vec: Array[Float],
                hyperplanes: Array[Array[Float]]): Array[Long] = {
    val totalBits = hyperplanes.length
    val codes = new Array[Long]((totalBits + 63) / 64)
    var j = 0
    while (j < totalBits) {
      val h = hyperplanes(j)
      var dot = 0.0
      var i = 0
      while (i < math.min(vec.length, h.length)) {
        dot += vec(i).toDouble * h(i).toDouble; i += 1
      }
      if (dot >= 0.0) codes(j / 64) |= 1L << (j % 64)
      j += 1
    }
    codes
  }

  /** Encode a plaintext vector column to packed code words — one fused
    * compiled pass per row.
    *
    * Adjudicated to STAY a UDF (UdfLedgerSpec, closure-model class): a
    * one-time indexing pass whose hyperplane family rides the closure;
    * the per-plane `aggregate`+sign+bit-OR expression rewrite bloats the
    * plan with ~planes×dim nodes for a scan-dominated pass. The query
    * path (Hamming top-k) is already pure expressions.
    */
  def encodeColumn(hyperplanes: Array[Array[Float]]): Column => Column = {
    val enc = udf((v: Seq[Float]) => encodeOne(v.toArray, hyperplanes))
    vecCol => enc(vecCol)
  }

  /** Encrypt-and-index (encrypted_search.rs:103-111): the returned frame
    * carries NO plaintext — only id, packed codes, and the original norm.
    */
  def encrypt(df: DataFrame, idCol: Column, vecCol: Column,
              hyperplanes: Array[Array[Float]]): DataFrame =
    df.select(idCol.as("id"),
      encodeColumn(hyperplanes)(vecCol).as("hash_codes"),
      sqrt(aggregate(transform(vecCol,
        x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x)).cast("float").as("original_norm"))

  /** Hamming top-k over the encoded frame (encrypted_search.rs:114-131).
    * Pure expressions: XOR + bit_count per word, summed, ascending top-k
    * with id tie-break (the reference's sort is unstable on ties).
    */
  def search(encrypted: DataFrame, queryCodes: Array[Long], totalBits: Int,
             k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    val ham = aggregate(
      zip_with(col("hash_codes"), lit(queryCodes),
        (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    encrypted
      .withColumn("hamming_distance", ham)
      .withColumn("estimated_similarity",
        lit(1.0) - col("hamming_distance") / totalBits.toDouble)
      .select(col("id"), col("hamming_distance"),
        col("estimated_similarity"))
      .orderBy(col("hamming_distance").asc, col("id").asc)
      .limit(k)
  }

  /** Recall heuristic (encrypted_search.rs:187-194). */
  def estimateAccuracy(cfg: Config): Float =
    math.min(1.0 - math.exp(-0.02 * cfg.totalBits), 0.99).toFloat
}
