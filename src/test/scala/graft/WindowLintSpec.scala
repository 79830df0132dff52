package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Executable form of the unpartitioned-window sweep (VERDICT r13 #2):
  * every `Window.orderBy(...)`-without-partitionBy and
  * `Window.partitionBy(lit(1))` site in src/main is a single-partition
  * global sort — acceptable ONLY on k-bounded candidate lists (guarded
  * via `Guards.requireKBounded`), variant-bounded frames, or the
  * documented oracle forms that ship scalable twins. This lint pins the
  * complete allowlist with exact per-file counts, so adding a NEW
  * unpartitioned window anywhere in main fails the suite until it is
  * either rewritten on `DistributedRank.rankedByRange` or explicitly
  * adjudicated here, and REMOVING one (e.g. an r14-style delegation)
  * fails until the stale allowlist entry is retired — the ledger can
  * never drift from the code.
  *
  * Comment lines are excluded (several scaladocs name the anti-pattern
  * in order to warn against it).
  */
class WindowLintSpec extends AnyFunSuite {

  // file (relative to src/main/scala/graft) -> expected site count,
  // with the adjudication for each entry
  private val allowlist: Map[String, Int] = Map(
    // oracle forms: single-window semantics references whose scalable
    // twins (shuffleRankScalable / packSequentialScalable) are proven
    // row-identical at 100k (in-suite) and 10M (opt-in) rows
    "pipeline/Sampling.scala" -> 2,
    // RRF fusion ranks two k-bounded candidate legs; both wrapped in
    // Guards.requireKBounded (static plan-time bound)
    "text/Rrf.scala" -> 2,
    // per-modality top-k then fused rank: output statically ≤ lists×k,
    // plan-audited (PlanAuditSpec: TakeOrderedAndProject per modality)
    "ops/CrossModal.scala" -> 1,
    // CrossCollection.merge ranks k-bounded per-collection results;
    // wrapped in Guards.requireKBounded
    "ops/AdvancedSearch.scala" -> 1,
    // ensembleRerank ranks each member's k-bounded candidate list;
    // wrapped in Guards.requireKBounded
    "ops/Extras.scala" -> 1,
    // rocchio variants frame: ≤ #variants rows (a handful of query
    // rewrites), bounded by construction
    "ops/RelevanceFeedback.scala" -> 1,
    // federated merge ranks ≤ sources×k candidate rows (k-bounded legs
    // from each source)
    "ops/Federated.scala" -> 1)

  private val root = Paths.get("src/main/scala/graft")

  private def isComment(line: String): Boolean = {
    val t = line.trim
    t.startsWith("*") || t.startsWith("//") || t.startsWith("/*")
  }

  // the second alternative matches ANY literal partition key
  // (lit(1), lit(1L), lit("all"), ...) — every spelling of a
  // constant-partitioned window is the same single-partition sort
  private val sitePattern =
    ("""Window\s*\.\s*orderBy""" + "|" +
      """Window\s*\.\s*partitionBy\(\s*lit\(""").r

  test("every unpartitioned ranking window in main is on the allowlist " +
      "with its exact count") {
    assert(Files.isDirectory(root), s"lint root missing: $root")
    val walk = Files.walk(root)
    val found: Map[String, Int] =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
        .map { p: Path =>
          val rel = root.relativize(p).toString.replace('\\', '/')
          // join non-comment lines so a site split across lines
          // (`Window\n  .partitionBy(lit(1))`) still matches — \s spans \n
          val text = Files.readAllLines(p).asScala
            .filterNot(isComment).mkString("\n")
          rel -> sitePattern.findAllIn(text).size
        }
        .filter(_._2 > 0).toMap
      finally walk.close()
    val newSites = found.filter { case (f, n) => n > allowlist.getOrElse(f, 0) }
    assert(newSites.isEmpty,
      s"NEW unpartitioned window site(s) — use DistributedRank.rankedByRange " +
        s"or adjudicate in WindowLintSpec: $newSites (allowed: $allowlist)")
    val stale = allowlist.filter { case (f, n) => found.getOrElse(f, 0) < n }
    assert(stale.isEmpty,
      s"stale allowlist entries (site removed or file renamed — retire " +
        s"them): $stale (found: ${found.filter(kv => allowlist.contains(kv._1))})")
  }
}
