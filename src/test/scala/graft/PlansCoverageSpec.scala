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

  test("iterative queries carry their inner-round plan rows (the round-12 blind spot)") {
    // The queries whose plans matter MOST at 100× are the iterative ones,
    // and their OUTER plans audit as '1xScan' behind the localCheckpoint
    // boundary. Since round 13 every IterativeLoop (plus the hand-rolled
    // HITS/PCA/min-label-CC/BPE loops) offers its representative round-2
    // frame to the audit via graft.ops.PlanProbe, and PLANS.md records it
    // as an `- inner loopN rK:` row. This pins the known iterative set so
    // a regeneration that silently loses the probes (or a refactor that
    // bypasses IterativeLoop without offering) fails the suite. New
    // iterative queries are picked up by the generator automatically —
    // extend this list when one lands.
    // Round 15 edits to this pinned set: q401_haar LEFT it (the 12-level
    // pyramid collapsed to a closed-form single aggregate — no loop, no
    // probe, deliberately); q131/q320/q328/q413 JOINED it (the round-14
    // probe-hole fix gave their hand-rolled loops PlanProbe ids, and the
    // round-15 PLANS.md regeneration is the first to record them).
    val iterative = Seq(
      "q111_bpe_encode", "q113_hits", "q123_quality_lr", "q131_mmr_rerank",
      "q132_label_prop",
      "q149_kcore", "q183_calibration", "q220_fertility", "q241_geo_median",
      "q254_huber_irls", "q264_grid_dbscan", "q320_als_rank1",
      "q321_spectral_split", "q328_centrality",
      "q336_raking_ipf", "q348_textrank", "q361_cox_ph", "q374_three_core",
      "q402_ktruss", "q403_set_cover",
      "q410_wl_refinement", "q413_diameter", "q417_rho_cycles",
      "q419_luby_mis",
      "q420_boruvka_mst", "q421_sssp", "q422_critical_path",
      "q423_closeness", "q436_hook_components", "q437_densest_peel",
      "q438_maximal_matching", "q440_jp_coloring", "q441_det_walks",
      "q442_linkage_assignment", "q445_grid_dbscan", "q446_incremental_cc", "q449_multi_source_bfs", "q450_stable_matching",
      "q53_dedup_clusters", "q59_drop_neardups", "q61_curate_corpus",
      "q75_bpe_merges", "q83_pagerank", "q96_pca_top", "q98_pca_outliers")
    val plans = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANS.md")), "UTF-8")
    val sections = plans.split("(?m)^## ").toSeq
    val withInner = sections.filter(_.contains("- inner loop"))
      .map(_.linesIterator.next().trim).toSet
    val missing = iterative.filterNot(withInner.contains)
    assert(missing.isEmpty,
      s"iterative queries without an inner-round plan row in PLANS.md: $missing")
  }
}
