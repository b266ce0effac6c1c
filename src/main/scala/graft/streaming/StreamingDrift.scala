package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One stream arrival for drift monitoring: a series key, a
  * deterministic order key, and the observed numeric value. */
case class DriftObs(series: String, seq: Long, value: Long)

/** Drift verdict for one completed evaluation window: the exact
  * two-sample KS statistic between the frozen reference sample and this
  * window, in the q212 integer form (d_num / (n1·n2)). */
case class DriftReport(series: String, window_index: Long, n_ref: Long,
    n_cur: Long, d_num: Long, d_stat: Double, drifted: Boolean)

/**
 * Streaming two-sample KS drift monitor: per series, the FIRST
 * `refSize` arrivals freeze a reference distribution; every subsequent
 * completed window of `winSize` arrivals is compared against it with
 * the exact integer Kolmogorov-Smirnov statistic (max |c₁·n₂ − c₂·n₁|
 * over the merged support, one divide at the end — the streaming twin
 * of batch q212). A report row is emitted per COMPLETED window, flagged
 * when D exceeds `threshold`.
 *
 * State per series is two count-histograms keyed by observed value —
 * O(distinct values), not O(arrivals): the memory contract that lets a
 * 100 TB/day ingest keep per-tenant drift state in a StateStore (values
 * with unbounded cardinality should be bucketed upstream, which is also
 * what makes the KS support axis meaningful). In-batch arrivals are
 * processed in `seq` order, so emitted reports are invariant to
 * micro-batch splits (the replayability discipline of
 * [[StreamingHeavyHitters]]).
 *
 * Compare batch q212 ([[graft.queries.CatalogStats.q212KsTest]]): same
 * statistic, same arithmetic; this one never re-reads history.
 */
object StreamingDrift {

  /** Exact two-sample KS numerator over two count histograms:
    * max over merged support of |c1·n2 − c2·n1| (cumulative counts). */
  private[streaming] def ksNum(ref: Map[Long, Long],
      cur: Map[Long, Long]): (Long, Long, Long) = {
    val n1 = ref.valuesIterator.sum
    val n2 = cur.valuesIterator.sum
    var c1 = 0L; var c2 = 0L; var best = 0L
    (ref.keySet ++ cur.keySet).toSeq.sorted.foreach { v =>
      c1 += ref.getOrElse(v, 0L)
      c2 += cur.getOrElse(v, 0L)
      val d = math.abs(c1 * n2 - c2 * n1)
      if (d > best) best = d
    }
    (best, n1, n2)
  }

  /** Monitor state: frozen reference counts (complete once refN ==
    * refSize), the in-progress window counts, and emit bookkeeping. */
  private[streaming] case class DriftState(ref: Map[Long, Long], refN: Long,
      cur: Map[Long, Long], curN: Long, windows: Long)

  /** Pure sequential step over one batch's arrivals; returns the new
    * state plus reports for every window completed during the batch. */
  private[streaming] def run(s0: DriftState, values: Seq[Long], series: String,
      refSize: Int, winSize: Int, threshold: Double): (DriftState, Seq[DriftReport]) = {
    var st = s0
    val out = Seq.newBuilder[DriftReport]
    values.foreach { v =>
      if (st.refN < refSize) {
        st = st.copy(ref = st.ref.updated(v, st.ref.getOrElse(v, 0L) + 1L),
          refN = st.refN + 1)
      } else {
        st = st.copy(cur = st.cur.updated(v, st.cur.getOrElse(v, 0L) + 1L),
          curN = st.curN + 1)
        if (st.curN == winSize) {
          val (num, n1, n2) = ksNum(st.ref, st.cur)
          val d = num.toDouble / (n1 * n2).toDouble
          out += DriftReport(series, st.windows, n1, n2, num, d, d > threshold)
          st = st.copy(cur = Map.empty, curN = 0L, windows = st.windows + 1)
        }
      }
    }
    (st, out.result())
  }

  def monitor(obs: Dataset[DriftObs], refSize: Int, winSize: Int,
      threshold: Double): Dataset[DriftReport] = {
    require(refSize >= 1 && winSize >= 1, "window sizes must be positive")
    require(threshold >= 0.0 && threshold <= 1.0, "threshold is a KS value in [0,1]")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.series)
      .flatMapGroupsWithState[DriftState, DriftReport](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (series: String, rows: Iterator[DriftObs], state: GroupState[DriftState]) =>
          val s0 = state.getOption
            .getOrElse(DriftState(Map.empty, 0L, Map.empty, 0L, 0L))
          val arrivals = rows.toSeq.sortBy(_.seq).map(_.value)
          val (s1, reports) = run(s0, arrivals, series, refSize, winSize, threshold)
          state.update(s1)
          reports.iterator
      }
  }
}
