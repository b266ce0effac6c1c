package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Audit hook that lets [[graft.tools.PlanCheck]] see INSIDE iterative
 * loops. The per-round lineage cut that makes the loops scale
 * (`localCheckpoint` — see [[IterativeLoop]]) also makes them opaque to
 * the physical-plan audit: the outer plan of q83/q113/q436/… records as
 * `1xScan ExistingRDD`, so the queries whose plans matter MOST at 100×
 * were exactly the ones the audit could not see (the round-12 verdict's
 * blind spot).
 *
 * Mechanism: every [[IterativeLoop]] combinator offers each round's
 * UNCUT stepped frame to the active recorder (a ThreadLocal, `None`
 * outside the audit — production runs pay one `ThreadLocal.get` per
 * round, nothing else). The recorder keeps ONE representative frame per
 * loop — round 2 when the loop reaches it, else round 1: round 2 is the
 * steady-state shape (its inputs are the cut LogicalRDD leaves every
 * later round sees; round 1 often reads pre-loop lineage that rounds
 * 2..n never touch). PlanCheck then records the captured frame's
 * operator histogram as an `inner:` row next to the outer plan.
 */
object PlanProbe {

  /** Per-loop capture: loop sequence id → (round, stepped frame). */
  final class Recorder {
    private val frames =
      scala.collection.mutable.LinkedHashMap.empty[Int, (Int, DataFrame)]
    private var nextLoop = 0
    private[ops] def newLoopId(): Int = { nextLoop += 1; nextLoop }
    private[ops] def offer(loopId: Int, round: Int, df: DataFrame): Unit =
      if (round <= 2) frames.get(loopId) match {
        case Some((r, _)) if r >= round => ()
        case _ => frames.update(loopId, (round, df))
      }
    /** (loopId, round, frame) per loop, in loop-start order. */
    def captured: Seq[(Int, Int, DataFrame)] =
      frames.toSeq.map { case (l, (r, d)) => (l, r, d) }
    /** How many loop ids were ISSUED during the recording — every
      * [[IterativeLoop]] combinator (and each hand-rolled loop) requests
      * one before its first round, independent of whether it later
      * offers a frame. The audit compares this against `captured.size`:
      * issued > captured means a loop ran without offering — the silent
      * probe miss that would otherwise demote an iterative query to
      * `linear-by-plan` in the ×10 registry (round-13 verdict item 2). */
    def issuedLoops: Int = nextLoop
  }

  /** Fails when a recording issued more loop ids than it captured frames
    * — the probe-independence gate: classification as "iterative" now
    * rests on loop INVOCATION (ids issued), not on the probe's success,
    * so a combinator that silently stops offering cannot dodge the ×10
    * evidence obligation. */
  def requireAllLoopsCaptured(name: String, r: Recorder): Unit =
    require(r.captured.size == r.issuedLoops,
      s"$name: ${r.issuedLoops} loop(s) invoked but only ${r.captured.size} " +
        "offered an inner-round frame — a loop is running unaudited (missing " +
        "PlanProbe.offer); PLANS.md would silently record it as non-iterative")

  private val sink = new ThreadLocal[Option[Recorder]] {
    override def initialValue(): Option[Recorder] = None
  }

  /** Run `body` with a fresh recorder active on this thread; returns the
    * body's value plus every loop's representative inner-round frame.
    * Frames are lazy plans — stringify/inspect after; nothing executes
    * here that `body` did not already execute. */
  def record[T](body: => T): (T, Seq[(Int, Int, DataFrame)]) = {
    val (t, r) = recordFull(body)
    (t, r.captured)
  }

  /** [[record]], returning the whole recorder so the audit can also
    * check completeness ([[requireAllLoopsCaptured]]) — captured frames
    * AND issued-loop count. */
  def recordFull[T](body: => T): (T, Recorder) = {
    val r = new Recorder
    val prev = sink.get()
    sink.set(Some(r))
    try { (body, r) } finally sink.set(prev)
  }

  /** `private[graft]` so the few HAND-ROLLED DataFrame loops that cannot
    * route through [[IterativeLoop]] (HITS's alternating two-frame state,
    * PCA's one-row power iteration) can offer their per-round frames
    * directly; every combinator-based loop probes automatically. */
  private[graft] def loopId(): Int = sink.get().map(_.newLoopId()).getOrElse(0)

  private[graft] def offer(loopId: Int, round: Int, df: DataFrame): Unit =
    sink.get().foreach(_.offer(loopId, round, df))
}
