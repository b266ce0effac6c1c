package graft

import org.scalatest.funsuite.AnyFunSuite

/** The second-chance bench baseline is pure logic — test it with a
  * synthetic 3× plant and the exact round-11 staleness scenario
  * (q119: r9 min 0.7641 stale in the single-source baseline masked a
  * 2.0959 s transient that was 3.45× the true r10 min 0.6071). */
class BenchBaselineSpec extends AnyFunSuite {

  private def detail(qs: (String, Double)*): String = {
    val m = qs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{"metric":"samples","samples":{}}
       |{"metric":"detail","queries":$m,"sf":"x","errors":[],"unit":"sec","sentinel_sec":0.09,"value":1.0}
       |""".stripMargin
  }

  test("parseDetail reads the flat queries map; garbage yields None") {
    assert(BenchBaseline.parseDetail(detail("q1_a" -> 0.5, "q2_b" -> 1.25))
      === Some(Map("q1_a" -> 0.5, "q2_b" -> 1.25)))
    assert(BenchBaseline.parseDetail("not json at all").isEmpty)
    assert(BenchBaseline.parseDetail("""{"metric":"total","value":3}""").isEmpty)
  }

  test("merged takes the per-query MIN across sources and drops -1 error markers") {
    val merged = BenchBaseline.merged(Seq(
      Map("q1" -> 0.7641, "q2" -> 2.0),
      Map("q1" -> 0.6071, "q3" -> -1.0)))
    assert(merged === Map("q1" -> 0.6071, "q2" -> 2.0))
  }

  test("synthetic 3x plant triggers; sub-3x and fast-query jitter do not") {
    assert(BenchBaseline.suspect(3.1, Some(1.0)))
    assert(!BenchBaseline.suspect(2.9, Some(1.0)))
    // ratio alone is not enough below the 0.3 s floor (fast-query jitter)
    assert(!BenchBaseline.suspect(0.29, Some(0.05)))
    assert(!BenchBaseline.suspect(1.0, None))
  }

  test("round-11 staleness scenario: the two-source min catches what the stale single source missed") {
    val staleOnly = BenchBaseline.merged(Seq(Map("q119_fuzzy_pairs" -> 0.7641)))
    val bothRounds = BenchBaseline.merged(Seq(
      Map("q119_fuzzy_pairs" -> 0.7641), Map("q119_fuzzy_pairs" -> 0.6071)))
    val measured = 2.0959
    assert(!BenchBaseline.suspect(measured, staleOnly.get("q119_fuzzy_pairs")),
      "the round-11 gap: vs the stale source alone this slipped through")
    assert(BenchBaseline.suspect(measured, bothRounds.get("q119_fuzzy_pairs")),
      "with the fresh round merged in, the same measurement must trigger")
  }

  test("defaultSources: explicit override wins alone; else working-tree detail + newest two round files") {
    assert(BenchBaseline.defaultSources(Some("/x/y.json")) === Seq("/x/y.json"))
    val defaults = BenchBaseline.defaultSources(None)
    assert(defaults.head === "BENCH_DETAIL.json")
    // run from the repo root there are committed round details; the newest
    // two are picked in round order
    val rs = defaults.tail
    assert(rs.size <= 2)
    assert(rs.forall(_.matches("BENCH_DETAIL_r\\d+\\.json")))
    assert(rs === rs.sortBy(n => "\\d+".r.findFirstIn(n).get.toInt))
  }
}
