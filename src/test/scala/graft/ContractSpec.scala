package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: queries and oracles stay in sync. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a query, and rows-only queries are exactly the documented set") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val orphanOracles = oracles.diff(queries)
    assert(orphanOracles.isEmpty, s"oracle SQL without a query: $orphanOracles")
    val rowsOnly = queries.diff(oracles)
    // q27 (engine-native xxhash64 simhash) is the last rows-only query;
    // q14 carries a tolerance-law oracle, q30's deterministic bucketing is
    // mirrored like q49's
    assert(rowsOnly == Set("q27_simhash_pairs"),
      s"rows-only queries drifted from the documented set: ${rowsOnly}")
  }

  test("query names follow the qNN_ naming scheme with no duplicates") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.forall(_.matches("q\\d{2}_[a-z0-9_]+")), names.filterNot(_.matches("q\\d{2}_[a-z0-9_]+")))
    assert(names.distinct.size === names.size)
  }
}
