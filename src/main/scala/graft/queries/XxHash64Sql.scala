package graft.queries

/** DuckDB SQL generator for Spark-compatible `xxhash64` (XXH64, seed 42,
  * over UTF-8 bytes) of a VARCHAR column — the missing piece that lets the
  * MinHash/SimHash oracles replicate signature VALUES, not just shapes.
  *
  * Technique: unsigned 64-bit state rides as HUGEINT in [0, 2^64); every
  * multiply is split 32/32 so no intermediate exceeds 2^96 (HUGEINT-safe);
  * XOR round-trips through BIGINT (bit patterns agree); rotations are
  * divmod arithmetic on disjoint bit ranges. Variable-length loops
  * (32-byte stripes, 8-byte tail chunks, trailing bytes) are
  * `list_reduce` folds; each DP step is its OWN nested subquery level
  * because DuckDB expands lateral aliases by substitution — chaining them
  * textually explodes the expression tree.
  *
  * Validated exactly (243/243 random strings, incl. multibyte UTF-8 and
  * ≥32-byte stripe paths) against Spark's XxHash64 during development;
  * the standing differential is the driver gate itself — every round the
  * minhash/simhash oracles recompute thousands of shingle hashes on both
  * engines and compare the downstream results by hash.
  */
object XxHash64Sql {

  private val M = "18446744073709551616"
  private val H = "9223372036854775808"
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"
  private val seed = BigInt(42)
  private val mod = BigInt(1) << 64
  private val v1 = ((seed + BigInt(P1) + BigInt(P2)) mod mod).toString
  private val v2 = ((seed + BigInt(P2)) mod mod).toString
  private val v3 = seed.toString
  private val v4 = ((seed - BigInt(P1)) mod mod).toString
  private val hShort = ((seed + BigInt(P5)) mod mod).toString

  private def mulmod(a: String, b: String): String =
    s"((($a) % 4294967296 * ($b)) % $M + " +
      s"((($a) // 4294967296 * ($b)) % 4294967296) * 4294967296) % $M"

  private def rotl(x: String, r: Int): String =
    s"((($x) * ${BigInt(1) << r}) % $M + ($x) // ${BigInt(1) << (64 - r)})"

  private def sgn(x: String): String =
    s"CAST((($x) + $H) % $M - $H AS BIGINT)"

  private def xor64(a: String, b: String): String =
    s"(CAST(xor(${sgn(a)}, ${sgn(b)}) AS HUGEINT) + $M) % $M"

  private def word(off: String, bytes: Int): String =
    (0 until bytes).map(t =>
      s"CAST(__bl[($off) + ${t + 1}] AS HUGEINT) * ${BigInt(1) << (8 * t)}")
      .mkString("(", " + ", ")")

  private def lane(v: String, k: String): String =
    mulmod(rotl(s"(($v) + ${mulmod(k, P2)}) % $M", 31), P1)

  private def merge(h: String, v: String): String =
    s"(${mulmod(xor64(h, mulmod(rotl(mulmod(v, P2), 31), P1)), P1)} + $P4) % $M"

  private def levels(sExpr: String): Seq[(String, String)] = {
    val stripe = s"[${word("32*t", 8)}, ${word("32*t + 8", 8)}, " +
      s"${word("32*t + 16", 8)}, ${word("32*t + 24", 8)}]"
    val chunk8 = s"(${mulmod(rotl(xor64("acc",
      mulmod(rotl(mulmod("k", P2), 31), P1)), 27), P1)} + $P4) % $M"
    val byteStep = mulmod(rotl(xor64("acc",
      s"(CAST(b AS HUGEINT) * $P5) % $M"), 11), P1)
    Seq(
      "__hex" -> s"hex(encode($sExpr))",
      "__nb" -> "length(__hex) // 2",
      "__bl" -> ("list_transform(range(0, __nb), j -> " +
        "CAST((strpos('0123456789ABCDEF', substr(__hex, 2*j + 1, 1)) - 1) * 16 + " +
        "strpos('0123456789ABCDEF', substr(__hex, 2*j + 2, 1)) - 1 AS BIGINT))"),
      "__vs" -> (s"list_reduce(list_prepend([CAST($v1 AS HUGEINT), $v2, $v3, $v4], " +
        s"list_transform(range(0, __nb // 32), t -> $stripe)), " +
        s"(vs, st) -> [${lane("vs[1]", "st[1]")}, ${lane("vs[2]", "st[2]")}, " +
        s"${lane("vs[3]", "st[3]")}, ${lane("vs[4]", "st[4]")}])"),
      "__hs0" -> (s"(${rotl("__vs[1]", 1)} + ${rotl("__vs[2]", 7)} + " +
        s"${rotl("__vs[3]", 12)} + ${rotl("__vs[4]", 18)}) % $M"),
      "__hs1" -> merge("__hs0", "__vs[1]"),
      "__hs2" -> merge("__hs1", "__vs[2]"),
      "__hs3" -> merge("__hs2", "__vs[3]"),
      "__hs4" -> merge("__hs3", "__vs[4]"),
      "__h1" -> s"((CASE WHEN __nb >= 32 THEN __hs4 ELSE $hShort END) + __nb) % $M",
      "__toff" -> "__nb // 32 * 32",
      "__h2" -> (s"list_reduce(list_prepend(__h1, " +
        s"list_transform(range(0, (__nb - __toff) // 8), t -> ${word("__toff + 8*t", 8)})), " +
        s"(acc, k) -> $chunk8)"),
      "__o4" -> "__toff + (__nb - __toff) // 8 * 8",
      "__h3" -> (s"CASE WHEN __nb - __o4 >= 4 THEN " +
        s"(${mulmod(rotl(xor64("__h2", mulmod(word("__o4", 4), P1)), 23), P2)} + $P3) % $M " +
        "ELSE __h2 END"),
      "__ob" -> "__o4 + (CASE WHEN __nb - __o4 >= 4 THEN 4 ELSE 0 END)",
      "__h4" -> (s"list_reduce(list_prepend(__h3, list_transform(" +
        s"__bl[__ob + 1:__nb], b -> CAST(b AS HUGEINT))), (acc, b) -> $byteStep)"),
      "__a1" -> xor64("__h4", s"__h4 // ${BigInt(1) << 33}"),
      "__a2" -> mulmod("__a1", P2),
      "__a3" -> xor64("__a2", s"__a2 // ${BigInt(1) << 29}"),
      "__a4" -> mulmod("__a3", P3),
      "__a5" -> xor64("__a4", s"__a4 // ${BigInt(1) << 32}"),
      "__xxh" -> sgn("__a5"))
  }

  /** Wrap `innerSql` (a SELECT producing the VARCHAR expression `sExpr`
    * among its columns) so the result carries an extra BIGINT column
    * `__xxh` = Spark's `xxhash64(sExpr)`; intermediates are dropped.
    */
  def wrap(innerSql: String, sExpr: String): String = {
    val chain = levels(sExpr).foldLeft(s"($innerSql)") {
      case (inner, (name, sql)) => s"(SELECT *, $sql AS $name FROM $inner)"
    }
    val drop = levels(sExpr).map(_._1).filterNot(_ == "__xxh").mkString(", ")
    s"(SELECT * EXCLUDE ($drop) FROM $chain)"
  }

  /** The MinHash permutation parameters as a SQL BIGINT[][] literal —
    * generated from the SAME Dedup.hashParams family the engine uses.
    */
  def minhashParamsSql(k: Int, seedVal: Long): String =
    graft.pipeline.Dedup.hashParams(k, seedVal)
      .map { case (a, b) => s"[$a, $b]" }
      .mkString("[", ", ", "]")

  /** [2^0 … 2^63] as a HUGEINT[] literal (SimHash bit weights). */
  val pow2Sql: String =
    (0 until 64).map(b => s"CAST(${BigInt(1) << b} AS HUGEINT)")
      .mkString("[", ", ", "]")
}
