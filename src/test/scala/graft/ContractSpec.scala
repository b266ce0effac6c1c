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
    // every declared query carries a full hash oracle: deterministic
    // approximations are mirrored in SQL (q26/q27/q30/q35/q49/q57), q14's
    // HLL sketch is a tolerance law asserted as a constant-TRUE boolean
    assert(rowsOnly.isEmpty, s"undocumented rows-only queries: ${rowsOnly}")
  }

  test("query names follow the qNN_ naming scheme with no duplicates") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), names.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+")))
    assert(names.distinct.size === names.size)
  }
}
