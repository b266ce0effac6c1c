package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact order statistics by distributed histogram refinement — the
 * no-sort quantile primitive behind q424 (and the robust-statistics ops
 * composed on it): each pass bins every still-open target's value
 * interval into [[Bins]] sub-bins with ONE conditional aggregate over
 * the column, the driver walks the ≤ targets×[[Bins]] counts to narrow
 * each interval, and width-1 intervals are exact. O(log_Bins range)
 * passes, O(targets × Bins) driver state at ANY corpus size; the
 * alternatives move the whole column (global sort) or rank every row
 * (window). Deterministic: pure counting — no sampling, no ties
 * ambiguity (the k-th smallest of a multiset is unique).
 */
object Quantiles {

  private[graft] val Bins = 256L
  private[graft] val MaxRounds = 16

  /** Exact k-th smallest of `valueCol` (long) for each (name, k) target,
    * 1 ≤ k ≤ n. Returns (name, k, value) in input order. The input frame
    * should be cheap to re-scan (pass a lineage-cut/cached frame). */
  def kthSmallest(values: DataFrame, valueCol: String,
      targets: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
    require(targets.nonEmpty, "no targets")
    // per-target state and the counts map are keyed by NAME — a duplicate
    // name would silently cross-wire intervals between targets
    require(targets.map(_._1).distinct.size == targets.size,
      s"duplicate target names: ${targets.map(_._1).mkString(", ")}")
    val cents = values.select(col(valueCol).cast("long").as("c"))
    val bounds = cents.agg(min(col("c")), max(col("c")), count(lit(1))).head()
    val (gMin, gMax, n) = (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    targets.foreach { case (nm, k) =>
      require(k >= 1 && k <= n, s"$nm: k=$k outside 1..$n") }
    val spark = values.sparkSession
    import spark.implicits._
    // (name, k, lo, hi, below): k-th smallest lies in [lo, hi]; `below`
    // counts rows with c < lo already accounted for
    var state = targets.map { case (nm, k) => (nm, k, gMin, gMax, 0L) }
    var rounds = 0
    while (state.exists(t => t._3 < t._4)) {
      rounds += 1
      require(rounds <= MaxRounds,
        s"quantile refinement exceeded $MaxRounds passes — interval " +
          "arithmetic bug, failing loudly")
      val open = state.filter(t => t._3 < t._4)
      val grids = open.map { case (nm, _, lo, hi, _) =>
        (nm, lo, hi, math.max(1L, (hi - lo) / Bins + 1L))
      }
      val gridDf = grids.toDF("nm", "lo", "hi", "w")
      val counts = cents.join(broadcast(gridDf),
          col("c") >= col("lo") && col("c") <= col("hi"))
        .groupBy(col("nm"), expr("(c - lo) div w").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      state = state.map {
        case t @ (_, _, lo, hi, _) if lo == hi => t
        case (nm, k, lo, _, below) =>
          val (_, _, hi, w) = grids.find(_._1 == nm).get
          val nBins = (hi - lo) / w + 1L
          var acc = below
          var bin = 0L
          while (bin < nBins && acc + counts.getOrElse((nm, bin), 0L) < k) {
            acc += counts.getOrElse((nm, bin), 0L)
            bin += 1L
          }
          require(bin < nBins, s"$nm: k=$k not located — count bug")
          val nLo = lo + bin * w
          (nm, k, nLo, math.min(hi, nLo + w - 1L), acc)
      }
    }
    state.map { case (nm, k, lo, _, _) => (nm, k, lo) }
  }
}
