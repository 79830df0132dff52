package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Sixth executable ledger (after WindowLint, AntiPattern, Persist,
  * FailurePathRelease, PlanSweep): every `udf(` construction site in
  * src/main, pinned per file with its adjudication. The engine's rubric
  * prefers built-ins and codegen'd expressions over Scala UDFs (a UDF
  * breaks whole-stage codegen at its column and costs ser/de per row),
  * so each site must fall into one of these classes — anything that a
  * built-in / `zip_with` / `aggregate` could replace is an
  * expression-candidate and must be rewritten or explicitly adjudicated
  * here:
  *
  *  - procedural-single-pass: a stateful or multi-output algorithm over
  *    one value that has no expression equivalent, or whose HOF
  *    "equivalent" is a per-element interpreted lambda measured slower
  *    than one compiled pass (Porter stemmer, tokenizer,
  *    simhash/minhash/rolling-hash, Gopher/C4/langID counting passes,
  *    RFC-7386 JSON merge, JSON-schema validation, sentence chunking,
  *    entity extraction). Measured on THIS engine, r16
  *    (bench_history/udf_vs_hof_r16.json, UdfVsHofBench, min of 5 at
  *    100k rows): gopherCounts UDF beats the per-token/per-line rlike
  *    formulation ~7× even while computing strictly more; the
  *    tokenizer UDF is at parity with split+filter(isInCollection) and
  *    stays a UDF for the Porter pass, which has no expression form;
  *    minhashSignature's HOF form re-evaluates the shingle subtree per
  *    permutation (60 ms/row vs µs/row, measured r9). CLASS BOUNDARY
  *    (r16): this rationale holds for STRING-input UDFs only — a
  *    numeric-ARRAY-input UDF boxes every element at deserialization
  *    and measured SLOWER than aggregate expressions (1.6× at 64-dim,
  *    ~9× at 384-dim), which is why DataProfiler.rowStats was rewritten
  *    as expressions in r16; simhash/minhash take Seq[Long] hash arrays
  *    but their counterfactual is the per-permutation subtree
  *    re-evaluation above, not a single aggregate;
  *  - closure-model: the function closes over driver-fit model state
  *    (PCA/projection matrices, quantization codebooks, anomaly model,
  *    cross-encoder scorer, LSH hyperplane family, the multimodal
  *    embed stub) — a literal-expression rewrite would re-encode the
  *    model into the plan per query; adjudicated per site below;
  *  - byte-packing: fp16/bf16 and SQ8/PQ/BQ code words are packed
  *    binary — bit twiddling over Array[Byte] has no Catalyst
  *    expression surface;
  *  - user-supplied: the Plugins API exists to run arbitrary user Scala
  *    functions — a UDF is the contract, not an accident.
  *
  * Notable single-site adjudications:
  *  - ann/EncryptedSearch.scala `encodeColumn` (r14 verdict item 4):
  *    STAYS a UDF. It is a one-time indexing pass (not a query-path
  *    operator); the 16-256-plane hyperplane family rides the closure,
  *    and the expression rewrite (per-plane `aggregate` dot product +
  *    sign + bit-OR fold, ~planes×dim expression nodes) was adjudicated
  *    worse: it bloats the plan quadratically with the plane count for
  *    a pass whose cost is dominated by the scan. The query path
  *    (Hamming top-k) is already pure expressions.
  *  - UdfVsHofBench.scala `rowStatsCounterfactualUdf`: the RETIRED
  *    DataProfiler rowStats UDF, kept only as the timed strawman the
  *    r16 measurement beat (boxing — see the class-boundary note
  *    above). It is never on a query path; a production re-use of it
  *    would need a fresh adjudication here.
  *
  * Growth fails until the new site is adjudicated here; shrinkage fails
  * until the stale entry is retired. Counting rules shared with the
  * other ledgers: comment lines excluded; `udf(` must not be preceded
  * by an identifier character (so `gopherCountsUdf(...)` call sites and
  * `spark.udf.register` don't count — only constructions).
  */
class UdfLedgerSpec extends AnyFunSuite {

  private val ledger: Map[String, Int] = Map(
    // closure-model: anomaly scorer fit on the driver
    "ops/Anomaly.scala" -> 1,
    // procedural-single-pass: capitalized-concept entity extraction
    "ops/GraphRag.scala" -> 1,
    // procedural-single-pass: RFC-7386 recursive JSON merge-patch ×2
    "ops/Mutations.scala" -> 2,
    // closure-model: registered cross-encoder scorer (FETCH rerank)
    "needleql/Compiler.scala" -> 1,
    // procedural-single-pass: Porter stem; one-pass tokenizer
    "text/Tokenizer.scala" -> 2,
    // closure-model: deterministic embed stub (multimodal contract)
    "multimodal/Multimodal.scala" -> 1,
    // procedural-single-pass: langID best-of, Gopher counts, C4 counts,
    // rolling hash — one compiled counting pass per rule set
    "pipeline/TextAnalysis.scala" -> 4,
    // procedural-single-pass: shingle/simhash ×2, minhash signature,
    // span fingerprint
    "pipeline/Dedup.scala" -> 4,
    // procedural-single-pass: sentence/window chunker
    "pipeline/Chunking.scala" -> 1,
    // procedural-single-pass: JSON-schema metadata validation
    "core/Validation.scala" -> 1,
    // closure-model: hyperplane encode — see header adjudication
    "ann/EncryptedSearch.scala" -> 1,
    // measured counterfactual ONLY (not a production operator): the
    // retired rowStats UDF formulation, kept solely as UdfVsHofBench's
    // timed strawman — see header adjudication
    "UdfVsHofBench.scala" -> 1,
    // byte-packing: fp16/bf16 encode + decode
    "ann/HalfPrecision.scala" -> 2,
    // closure-model: fitted projection/PCA matrix-vector transforms
    "ann/DimReduce.scala" -> 3,
    // closure-model + byte-packing: SQ8/PQ/BQ codebooks over packed
    // code words (encode ×5, decode/ADC distance ×4)
    "ann/Quantization.scala" -> 9,
    // user-supplied: plugin distance + embedding transformer contracts
    "plugins/Plugins.scala" -> 2)

  private val root = Paths.get("src/main/scala/graft")

  private def isComment(line: String): Boolean = {
    val t = line.trim
    t.startsWith("*") || t.startsWith("//") || t.startsWith("/*")
  }

  private val sitePattern = """(^|[^A-Za-z0-9_])udf\s*\(""".r

  test("every udf( construction site in main is on the ledger with its " +
      "exact count and adjudication") {
    assert(Files.isDirectory(root), s"lint root missing: $root")
    val walk = Files.walk(root)
    val found: Map[String, Int] =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
        .map { p: Path =>
          val rel = root.relativize(p).toString.replace('\\', '/')
          val text = Files.readAllLines(p).asScala
            .filterNot(isComment).mkString("\n")
          rel -> sitePattern.findAllIn(text).size
        }
        .filter(_._2 > 0).toMap
      finally walk.close()
    val newSites = found.filter { case (f, n) => n > ledger.getOrElse(f, 0) }
    assert(newSites.isEmpty,
      s"NEW udf( site(s) — adjudicate procedural-single-pass / " +
        s"closure-model / byte-packing / user-supplied (or rewrite as an " +
        s"expression) in UdfLedgerSpec: $newSites (allowed: $ledger)")
    val stale = ledger.filter { case (f, n) => found.getOrElse(f, 0) < n }
    assert(stale.isEmpty,
      s"stale ledger entries (site removed or file renamed — retire " +
        s"them): $stale (found: ${found.filter(kv => ledger.contains(kv._1))})")
  }
}
