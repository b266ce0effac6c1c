package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Structural one-row guard for the scalar-subquery idiom (round-13
 * verdict item 7). The catalog attaches driver-free scalars (totals,
 * ranges, order-statistic cuts, convergence state) to data frames as
 * `df.crossJoin(broadcast(scalarFrame))` — a BroadcastNestedLoopJoin
 * that is cheap precisely BECAUSE the broadcast side is one row. Through
 * round 12 that was a convention (~200 call sites); a future refactor
 * that turned a one-row aggregate into a multi-row frame would silently
 * become a real cartesian ×n blow-up.
 *
 * [[scalar]] makes the contract part of the PLAN: the frame passes
 * through a global aggregate (`first` per column + `count`) and an
 * `assert_true(count == 1)` filter, so a multi-row (or empty —
 * `crossJoin` with an empty side silently annihilates the output, the
 * nastier bug) scalar fails the job loudly instead of shipping wrong
 * data. On the contract-respecting path the added cost is a one-row
 * aggregate — noise, as the round-12 guard benches showed.
 *
 * [[bounded]] is the escape hatch for the few DOCUMENTED small-constant
 * broadcast frames (polygon edge tables, collected top-k panels): same
 * loud-failure idea, bound stated at the call site.
 *
 * GuardsLintSpec greps the main tree: every `crossJoin(broadcast(...))`
 * must route its broadcast side through one of these two, which is what
 * turns the convention into a compile-adjacent, greppable invariant.
 */
object Guards {

  /** Cap for broadcast QUERY/panel sets (the brute-force-with-broadcast
    * pattern: q108's rerank shortlist, q118's PQ query tables, q432's
    * offline-eval batch). Generous relative to every documented panel at
    * ×10 volume (≤ ~8k rows), small relative to a corpus — exceeding it
    * means someone passed a data-sized relation as the broadcast side,
    * which is exactly the cartesian blow-up these guards exist to make
    * loud. */
  val BroadcastSetCap: Int = 100000

  /** Assert-in-plan that `df` has EXACTLY one row, preserving its schema
    * (per-column `first` over the single row is the identity). Empty and
    * multi-row frames fail the job with `msg`. */
  def scalar(df: DataFrame, msg: String = "Guards.scalar: expected exactly one row"): DataFrame = {
    val aggs = df.columns.map(c => first(col(c)).as(c))
    val agged =
      if (aggs.isEmpty) df.groupBy().agg(count(lit(1)).as("__graft_n"))
      else df.groupBy().agg(aggs.head, aggs.tail :+ count(lit(1)).as("__graft_n"): _*)
    agged
      .filter(coalesce(assert_true(col("__graft_n") === 1L, lit(msg)), lit(true)))
      .drop("__graft_n")
  }

  /** Assert-in-plan that `df` has at most `maxRows` rows (and at least
    * one): the guard for documented SMALL-CONSTANT broadcast tables. Row
    * content passes through untouched (global count window over a
    * ≤maxRows frame — bounded by the same contract it asserts). */
  def bounded(df: DataFrame, maxRows: Int,
      msg: String = "Guards.bounded: broadcast side exceeded its stated bound"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    df.withColumn("__graft_n", count(lit(1)).over(w))
      .filter(coalesce(assert_true(
        col("__graft_n") >= 1L && col("__graft_n") <= maxRows,
        lit(s"$msg (max $maxRows)")), lit(true)))
      .drop("__graft_n")
  }
}
