package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed physical-plan audit (PLANS.md) has the same every-query
  * contract the catalog has — in round 11 it silently went 6 queries
  * stale because regeneration was a memory, not a gate. This spec makes
  * staleness a test failure: every SparkEntry.queries key must have its
  * `## qNN_name` entry in the committed artifact (run
  * `sbt "runMain graft.tools.PlanCheck"` after adding queries). */
class PlansCoverageSpec extends AnyFunSuite {

  test("PLANS.md covers every catalog query") {
    val plans = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANS.md")), "UTF-8")
    val entries = "(?m)^## (q\\w+)$".r.findAllMatchIn(plans).map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet -- entries
    assert(missing.isEmpty,
      s"stale PLANS.md — regenerate with PlanCheck; missing: ${missing.toSeq.sorted}")
    val orphans = entries -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"PLANS.md lists queries the catalog no longer has: ${orphans.toSeq.sorted}")
    assert(!plans.contains("\nFAILED:"),
      "PLANS.md carries FAILED plan-audit entries — fix or regenerate")
  }
}
