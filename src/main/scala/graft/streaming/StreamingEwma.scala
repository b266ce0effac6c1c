package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One bucketed observation for the smoother (same shape as CusumObs). */
case class EwmaObs(series: String, bucket: Long, c: Long)
case class EwmaPoint(series: String, bucket: Long, c: Long, ewma: Double)

/**
 * Streaming twin of [[graft.ops.TimeSeries.ewmaSmooth]]: the truncated
 * α = 1/2 EWMA kept live per series with BOUNDED state — the last `lags`
 * observed counts (a ring of ≤ lags longs), vs the batch op's window
 * frame. Arithmetic is identical: integer numerator Σ cnt·2^(lags−1−k)
 * over the available history, integer denominator of matching weights,
 * one double divide — so the streamed points equal the batch recompute
 * over any prefix (the spec's law), and state never grows with time.
 *
 * In-batch arrivals are processed in ascending bucket order, like
 * [[StreamingCusum]]: shuffle arrival order is an artifact; smoothing
 * history must be replayable.
 */
object StreamingEwma {

  def smooth(obs: Dataset[EwmaObs], lags: Int = 8): Dataset[EwmaPoint] = {
    require(lags >= 1 && lags <= 62, s"lags must be in [1, 62], got $lags")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.series)
      .flatMapGroupsWithState[List[Long], EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (series: String, rows: Iterator[EwmaObs],
            state: GroupState[List[Long]]) =>
          // state: most-recent-first counts, length <= lags
          var hist = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[EwmaPoint]
          rows.toSeq.sortBy(_.bucket).foreach { o =>
            hist = (o.c :: hist).take(lags)
            val num = hist.zipWithIndex
              .map { case (v, k) => v * (1L << (lags - 1 - k)) }.sum
            val den = hist.indices.map(k => 1L << (lags - 1 - k)).sum
            out += EwmaPoint(series, o.bucket, o.c,
              num.toDouble / den.toDouble)
          }
          state.update(hist)
          out.result().iterator
      }
  }
}
