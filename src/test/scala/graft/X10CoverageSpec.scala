package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed ×10 evidence registry (X10GATE.md) has the same
  * every-query contract as PLANS.md: the at-scale gate was an implicit
  * policy through round 12 (67 x10 rows, ~380 exempt by unstated
  * convention); the registry makes it closed-world, and this spec makes
  * regeneration a gate — a new query (especially an iterative one)
  * cannot land without either a ×10 hash row or a NAMED exemption.
  * Regenerate with `sbt "runMain graft.tools.X10Gate"` (which itself
  * fails on an unevidenced iterative query). */
class X10CoverageSpec extends AnyFunSuite {

  private def read(p: String) = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get(p)), "UTF-8")

  test("X10GATE.md covers every catalog query, no orphans, no MISSING") {
    val gate = read("X10GATE.md")
    val rows = "(?m)^\\| (q\\d+_\\w+) \\| ([\\w-]+) \\|".r.findAllMatchIn(gate)
      .map(m => m.group(1) -> m.group(2)).toMap
    val missing = SparkEntry.queries.keySet -- rows.keySet
    assert(missing.isEmpty,
      s"stale X10GATE.md — regenerate with X10Gate; missing: ${missing.toSeq.sorted}")
    val orphans = rows.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"X10GATE.md lists queries the catalog no longer has: ${orphans.toSeq.sorted}")
    assert(!rows.values.exists(_ == "MISSING"),
      "X10GATE.md carries MISSING rows — add x10 evidence or a named exemption")
  }

  test("every iterative query (PLANS.md inner row) has x10 evidence or a named exemption") {
    val gate = read("X10GATE.md")
    val rows = "(?m)^\\| (q\\d+_\\w+) \\| ([\\w-]+) \\|".r.findAllMatchIn(gate)
      .map(m => m.group(1) -> m.group(2)).toMap
    val plans = read("PLANS.md")
    var cur = ""
    val iterative = scala.collection.mutable.Set.empty[String]
    plans.linesIterator.foreach { l =>
      if (l.startsWith("## q")) cur = l.drop(3).trim
      else if (l.startsWith("- inner loop")) iterative += cur
    }
    val weak = iterative.toSeq.sorted
      .filter(q => !Set("x10", "exempt").contains(rows.getOrElse(q, "ABSENT")))
    assert(weak.isEmpty,
      s"iterative queries with only a linear-by-plan (or absent) x10 status: $weak")
  }
}
