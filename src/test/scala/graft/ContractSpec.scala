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
    // round 5 closed the last rows-only gaps: q14 became a tolerance law,
    // q27 moved to md5-derived simhash weights, q30's bucketing is mirrored
    // like q49's — every declared query now carries a full hash oracle
    assert(rowsOnly.isEmpty, s"undocumented rows-only queries: ${rowsOnly}")
  }

  test("query names follow the qNN_ naming scheme with no duplicates") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.forall(_.matches("q\\d{2}_[a-z0-9_]+")), names.filterNot(_.matches("q\\d{2}_[a-z0-9_]+")))
    assert(names.distinct.size === names.size)
  }
}
