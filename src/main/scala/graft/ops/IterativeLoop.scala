package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The ONE place iterative DataFrame loops live — fixed-iteration folds
 * with a mandatory per-round lineage cut, plus the law hook specs use to
 * assert a loop actually reached (or contracts toward) its fixed point.
 *
 * Why this exists: referencing the previous round's frame more than once
 * without a cut doubles the logical plan every round — the same bug cost
 * a measured order of magnitude three separate times (q83 PageRank
 * 20.6 s → 2.9 s, q336 IPF 58.7 s → 1.2 s, and the q321 power iteration
 * before it grew its own cut). Routing every loop through [[fixed]] /
 * [[fixedEager]] makes the bug unrepresentable: the cut is applied by
 * the combinator, not remembered by each author.
 *
 * Cut semantics (extracted from the dedup module, where they grew up):
 *
 *  - [[cut]] (eager): reliable `checkpoint` when the session has a
 *    checkpoint dir configured — the fault-tolerant cluster path; a lost
 *    executor replays from checkpoint files, so a 100 TB run survives
 *    mid-loop failures — else eager `localCheckpoint` (executor-held
 *    blocks, documented non-fault-tolerant, fine on local[n]). Callers
 *    opt into reliability with `sparkContext.setCheckpointDir(...)`.
 *    DISK NOTE for the reliable path: superseded snapshots are deleted
 *    only when `spark.cleaner.referenceTracking.cleanCheckpoints=true`
 *    (a context-start conf, default false); set it on long-running
 *    cluster jobs or point the dir at lifecycle-managed scratch space.
 *
 *  - [[cutLazy]]: the local branch defers materialization to the final
 *    action, so a FIXED-iteration loop runs as one job instead of one
 *    eager-checkpoint job per round (measured on q83: 20.6 s → ~4 s at
 *    sf0.1). The reliable branch stays EAGER on purpose: Spark's
 *    non-eager `checkpoint(false)` neither persists nor reliably writes
 *    intermediate marked RDDs (checkpointAllMarkedAncestors defaults to
 *    false), so a lazy reliable cut would silently skip the
 *    fault-tolerance it claims. Convergence-driven loops act every round
 *    anyway — they use [[cut]].
 */
object IterativeLoop {

  /** Eager lineage cut — see the class doc for the reliable-vs-local
    * branch semantics. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** Lazy lineage cut for fixed-iteration loops — one job for the whole
    * loop on the local branch; eager-reliable when a checkpoint dir is
    * configured (see class doc for why). */
  def cutLazy(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(false)

  /** Run `step` for exactly `rounds` iterations (1-based round index),
    * lazily cutting lineage after EVERY round. The default combinator
    * for fixed-round dataflow loops (PageRank, power iteration, IPF,
    * gradient descent, Newton): per-round plan depth stays constant
    * regardless of round count. */
  def fixed(init: DataFrame, rounds: Int)(step: (DataFrame, Int) => DataFrame): DataFrame = {
    require(rounds >= 1, s"need at least one round, got $rounds")
    (1 to rounds).foldLeft(init)((df, i) => cutLazy(step(df, i)))
  }

  /** [[fixed]] with an EAGER cut per round — for loops whose next round
    * branches on the previous result many times, or that interleave
    * driver-side decisions (each round materializes before the next
    * plans). */
  def fixedEager(init: DataFrame, rounds: Int)(step: (DataFrame, Int) => DataFrame): DataFrame = {
    require(rounds >= 1, s"need at least one round, got $rounds")
    (1 to rounds).foldLeft(init)((df, i) => cut(step(df, i)))
  }

  /** Stats-fresh lazy cut for REPEATED-SQUARING loops (the next round
    * self-joins the previous round, e.g. pointer doubling / path
    * squaring). [[cutLazy]]'s `localCheckpoint` carries the source
    * plan's statistics into the `LogicalRDD` (`originStats`), so a
    * squaring loop SQUARES the inherited sizeInBytes estimate every
    * round — after 20 doublings the stats visitor multiplies
    * million-digit BigIntegers and planning spins for minutes on the
    * driver (observed on the q417 rho map; the same shape at 4 rounds,
    * q407, merely inflates 16×). This cut rebuilds the frame with
    * default statistics so the estimate stays bounded. Trade-off: the
    * optimizer loses the size estimate (no auto-broadcast off this
    * frame) — squaring loops shuffle-join by design, so nothing is
    * lost there; prefer [[cutLazy]] everywhere else. */
  def cutFresh(df: DataFrame): DataFrame =
    org.apache.spark.sql.GraftSqlShim.freshLocalCheckpoint(df)

  /** [[fixed]] with the stats-fresh cut — the combinator for
    * repeated-squaring loops. */
  def fixedFresh(init: DataFrame, rounds: Int)(step: (DataFrame, Int) => DataFrame): DataFrame = {
    require(rounds >= 1, s"need at least one round, got $rounds")
    (1 to rounds).foldLeft(init)((df, i) => cutFresh(step(df, i)))
  }

  /** Fixed-point law hook: max over join keys of |step(df) − df| on
    * `valueCol` (absent keys on either side contribute their full
    * magnitude via the outer join's zero-fill — a key appearing or
    * disappearing is NOT a fixed point). Specs assert this is ~0 for
    * converged loops, or that it contracts (gap after k rounds < gap
    * after 1) for fixed-round loops. Driver-side scalar by design — a
    * law, not a production path. */
  def fixedPointGap(df: DataFrame, keys: Seq[String], valueCol: String)(
      step: DataFrame => DataFrame): Double = {
    val cur = df.select(keys.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
    val nxt = step(df).select(keys.map(col) :+ col(valueCol).cast("double").as("__vn"): _*)
    cur.join(nxt, keys, "full_outer")
      .select(abs(coalesce(col("__vn"), lit(0.0)) - coalesce(col("__v"), lit(0.0))).as("d"))
      .agg(max(col("d")).as("gap"))
      .collect()(0).getDouble(0)
  }
}
