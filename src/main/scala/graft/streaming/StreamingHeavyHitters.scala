package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One stream arrival: a series key (the summary scope, e.g. a topic or
  * tenant), a deterministic order key, and the observed item. */
case class HhObs(series: String, seq: Long, item: String)

/** Summary snapshot emitted after each micro-batch: the k surviving
  * counters plus the totals needed to state the MG error bound. */
case class HhSummary(series: String, item: String, est: Long,
    n_seen: Long, err_bound: Long)

/**
 * Streaming heavy hitters via Misra–Gries (Misra & Gries, Sci. Comput.
 * Program. 1982): at most `k` counters per series, ever — the
 * bounded-memory frequent-items summary. Arrival of item x: if x has a
 * counter, increment; else if a slot is free, open one at 1; else
 * decrement ALL counters and drop zeros (the "pigeonhole charge" — one
 * arrival cancels one occurrence of k distinct items).
 *
 * Guarantees (the spec's laws, both direct corollaries of the charge
 * argument): every counter underestimates by at most N/(k+1), and any
 * item with true frequency > N/(k+1) is GUARANTEED present — so the
 * summary is a superset of the true heavy hitters at that threshold.
 *
 * Why this exists next to the batch exact count: batch `groupBy(item)`
 * shuffles the vocabulary; this state is O(k) per series FOREVER, the
 * canonical trade a 100 TB ingest monitor makes. In-batch arrivals are
 * processed in `seq` order (shuffle arrival order is an artifact; the MG
 * state must be replayable), so the post-batch summary equals the
 * sequential run over any prefix — the micro-batch-split-invariance law.
 *
 * Emits the full surviving summary after each micro-batch (Append mode,
 * snapshot-per-batch like [[StreamingFingerprint]]).
 */
object StreamingHeavyHitters {

  /** Pure sequential MG step over one micro-batch's arrivals.
    * `private[graft]`: q454's batch twin runs the SAME kernel per
    * series over the md5 panel, which is what lets the oracle-graded
    * batch query stand in for this component's correctness. */
  private[graft] def mgRun(counters: Map[String, Long], n0: Long,
      items: Seq[String], k: Int): (Map[String, Long], Long) = {
    var c = counters
    var n = n0
    items.foreach { x =>
      n += 1
      c.get(x) match {
        case Some(v) => c = c.updated(x, v + 1)
        case None if c.size < k => c = c.updated(x, 1L)
        case None =>
          c = c.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }
    }
    (c, n)
  }

  def summarize(obs: Dataset[HhObs], k: Int): Dataset[HhSummary] = {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.series)
      .flatMapGroupsWithState[(Map[String, Long], Long), HhSummary](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (series: String, rows: Iterator[HhObs],
            state: GroupState[(Map[String, Long], Long)]) =>
          val (c0, n0) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
          val arrivals = rows.toSeq.sortBy(_.seq).map(_.item)
          val (c1, n1) = mgRun(c0, n0, arrivals, k)
          state.update((c1, n1))
          val bound = n1 / (k + 1)
          c1.toSeq.sortBy(-_._2)
            .map { case (item, est) => HhSummary(series, item, est, n1, bound) }
            .iterator
      }
  }
}
