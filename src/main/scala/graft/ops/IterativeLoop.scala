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
    val lid = PlanProbe.loopId()
    (1 to rounds).foldLeft(init) { (df, i) =>
      val s = step(df, i); PlanProbe.offer(lid, i, s); cutLazy(s)
    }
  }

  /** [[fixed]] with an EAGER cut per round — for loops whose next round
    * branches on the previous result many times, or that interleave
    * driver-side decisions (each round materializes before the next
    * plans). */
  def fixedEager(init: DataFrame, rounds: Int)(step: (DataFrame, Int) => DataFrame): DataFrame = {
    require(rounds >= 1, s"need at least one round, got $rounds")
    val lid = PlanProbe.loopId()
    (1 to rounds).foldLeft(init) { (df, i) =>
      val s = step(df, i); PlanProbe.offer(lid, i, s); cut(s)
    }
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
    val lid = PlanProbe.loopId()
    (1 to rounds).foldLeft(init) { (df, i) =>
      val s = step(df, i); PlanProbe.offer(lid, i, s); cutFresh(s)
    }
  }

  /** Result of [[fixedUntil]]: the converged (or cap-round) frame, the
    * number of `step` rounds actually materialized, and whether an exact
    * fixed point was observed before the cap. */
  final case class FixedResult(df: DataFrame, rounds: Int, converged: Boolean)

  /** Exact multiset equality — `exceptAll` both directions. The default
    * (always-sound) [[fixedUntil]] probe; two state-frame-sized shuffles
    * per round. */
  val multisetEqual: (DataFrame, DataFrame) => Boolean =
    (a, b) => b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty

  /** Build a cheap [[fixedUntil]] probe from a driver-scalar summary:
    * converged when the summary repeats. SOUND ONLY when the caller can
    * argue summary-stationary ⟺ fixed point — e.g. a per-key MONOTONE
    * loop with an invariant key set, where sum(value) is stationary iff
    * no value moved. One map-side-combinable aggregate per round instead
    * of [[multisetEqual]]'s two shuffles.
    *
    * Round 15 (optimization): the probe MEMOIZES the last frame's summary.
    * [[fixedUntil]] always calls it with `prev` = the exact frame object
    * the previous call saw as `next`, so re-aggregating `prev` was a pure
    * duplicate driver action — at sf0.1 the convergence-driven graph loops
    * paid 2 jobs/round where 1 carries all the information (guide §1/§5:
    * per-round fixed driver cost dominates small-state iterative queries;
    * at cluster scale it is one fewer full pass over the state per round).
    * Reference equality (`eq`) keys the memo, so any caller that passes a
    * different frame still gets a fresh aggregate — semantics unchanged.
    *
    * Round 16 (r15 VERDICT #2 / ADVICE): the memo is ONE immutable
    * (frame, summary) pair behind a single `@volatile` write — the old
    * two-field form could hand a probe shared across concurrently-running
    * loops a TORN pair (new frame, stale summary) and answer the
    * convergence question wrongly. One volatile reference makes the pair
    * atomic; each loop still sees its own last write (per-loop probes are
    * single-threaded), and a cross-thread reader sees either a fully-old
    * or fully-new pair, never a mix. */
  def stationaryAgg(summary: DataFrame => Seq[Any]): (DataFrame, DataFrame) => Boolean = {
    val memo = new java.util.concurrent.atomic.AtomicReference[(DataFrame, Seq[Any])](null)
    (prev, next) => {
      val last = memo.get()
      val p = if (last != null && (prev eq last._1)) last._2 else summary(prev)
      val n = summary(next)
      memo.set((next, n))
      n == p
    }
  }

  /** Run `step` until an EXACT fixed point, with `maxRounds` as the
    * guard: lazy cut per round (the probe's action is what materializes
    * it — one job per round, not two), then `sameAs` against the previous
    * round. Early exit is hash-identical to [[fixed]]`(maxRounds)` by
    * construction — a deterministic `step` satisfies step(fp) = fp, so
    * every skipped round is a no-op. Use when the round cap is a SAFETY
    * NET over a loop that genuinely converges in integer state (LIS
    * relaxation, label propagation); loops whose round count IS the
    * contract (the oracle replays exactly k rounds and the values are
    * still moving at k — e.g. the scaled-BIGINT PageRank/HITS whose
    * deltas need ~log₀.₈₅(scale⁻¹) rounds to quantize out) keep
    * [[fixed]] — there the probes are pure overhead, measured +25% on q83.
    *
    * `requireConverged = true` turns cap exhaustion into a loud failure —
    * for loops whose RESULT is only exact at the fixed point (q416's LIS:
    * after r rounds the value is min(truth, r+1), so a saturated cap
    * hash-matches a silently wrong answer in BOTH engines).
    */
  def fixedUntil(init: DataFrame, maxRounds: Int,
      requireConverged: Boolean = false,
      sameAs: (DataFrame, DataFrame) => Boolean = multisetEqual)(
      step: (DataFrame, Int) => DataFrame): FixedResult = {
    require(maxRounds >= 1, s"need at least one round, got $maxRounds")
    val lid = PlanProbe.loopId()
    var cur = cutLazy(init)
    var i = 0
    var conv = false
    while (i < maxRounds && !conv) {
      val stepped = step(cur, i + 1)
      PlanProbe.offer(lid, i + 1, stepped)
      val next = cutLazy(stepped)
      conv = sameAs(cur, next)
      cur = next
      i += 1
    }
    require(!requireConverged || conv,
      s"fixedUntil: no fixed point within $maxRounds rounds — the cap is " +
        "too small for this data; a capped result would be silently wrong")
    FixedResult(cur, i, conv)
  }

  /** Run `step` for up to `maxRounds` rounds with an EXACT early exit
    * (round 15): `step` returns the next state carrying an extra LONG
    * column `changedCol` (>0 on every row that moved this round); the
    * combinator cuts the frame WITH the column, reads Σ changedCol in the
    * one aggregate job that also materializes the cut (no separate probe
    * scan — the persisted blocks serve both the test and the next round),
    * strips the column, and stops after the first round reporting zero
    * moved rows.
    *
    * PRECONDITION (r15 ADVICE): the step must be ROW-PRESERVING — every
    * state row must appear exactly once in step(state) (keyed totally, no
    * filters, no row-dropping/duplicating joins). Only then does
    * Σ changedCol = 0 prove step(state) = state: a step whose join
    * silently drops or duplicates rows could report zero moved rows while
    * the state changed, and the early exit would NOT be hash-identical to
    * the fixed unroll. The current caller (Boruvka's pointer-squaring
    * flatten: a left-join total over a unique key set) satisfies this;
    * any new caller must argue it explicitly.
    *
    * Given row preservation, soundness needs NO monotonicity argument,
    * unlike [[stationaryAgg]]: zero moved rows IS step(state) = state, so every
    * remaining round of the cap is the identity and the early exit is
    * hash-identical to the full `fixed(maxRounds)` unroll — the right
    * tool for fixed-round loops whose oracle unrolls the cap but whose
    * data usually converges earlier (e.g. a pointer-squaring flatten that
    * finishes in ⌈log₂ depth⌉ ≪ cap rounds; each skipped round is an
    * edge-sized self-join that never runs, at ANY scale).
    *
    * (NOT an `Observation`: observe metrics are only delivered through a
    * Dataset action on the observed plan's own QueryExecution — Dedup's
    * eager `localCheckpoint(true)` qualifies, but the lazy and stats-fresh
    * cuts materialize through plain RDD jobs, which would leave
    * `Observation.get` blocked forever.)
    *
    * `fresh = true` uses the stats-fresh cut ([[cutFresh]]) — mandatory
    * for repeated-squaring loops, see [[cutFresh]]'s doc. */
  def fixedUntilNoChange(init: DataFrame, maxRounds: Int, changedCol: String,
      fresh: Boolean = false)(step: (DataFrame, Int) => DataFrame): DataFrame = {
    require(maxRounds >= 1, s"need at least one round, got $maxRounds")
    val lid = PlanProbe.loopId()
    val cutF: DataFrame => DataFrame = if (fresh) cutFresh else cutLazy
    var cur = cutF(init)
    var i = 0
    var moving = true
    while (i < maxRounds && moving) {
      val stepped = step(cur, i + 1)
      PlanProbe.offer(lid, i + 1, stepped)
      val next = cutF(stepped)
      // this aggregate is the job that materializes the cut's blocks
      moving = next.agg(coalesce(sum(col(changedCol)), lit(0L)))
        .collect()(0).getLong(0) != 0L
      cur = next.drop(changedCol)
      i += 1
    }
    cur
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
