package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One bucketed observation: a series key, a monotonically-keyed bucket
  * (e.g. the hour), and its count. */
case class CusumObs(series: String, bucket: Long, c: Long)
case class CusumAlarm(series: String, bucket: Long, c: Long,
    cusum: Double, alarm: Boolean)

/**
 * Streaming CUSUM — [[graft.ops.TimeSeries.cusumDrift]]'s recurrence run
 * continuously over an ingest stream: per series, s ← max(0, s + (c − μ))
 * on every arriving bucket, alarm when s > h. μ and h are FIXED reference
 * parameters here (the deployed-monitor setting: μ calibrated offline on
 * a training window, exactly how production CUSUM monitors run) — which
 * is what makes the state ONE double per series, O(|series|) forever,
 * instead of the batch op's whole-history windows.
 *
 * Buckets inside a micro-batch are processed in ascending bucket order
 * (shuffle arrival order is an artifact; drift accumulation must be
 * replayable), and the recurrence is sequential by definition, so the
 * streamed alarms equal the batch recompute with the same (μ, h) over
 * any prefix — the StreamingCusumSpec law.
 */
object StreamingCusum {

  def drift(obs: Dataset[CusumObs], mu: Double, h: Double): Dataset[CusumAlarm] = {
    require(h > 0, s"alarm threshold must be positive, got $h")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.series)
      .flatMapGroupsWithState[Double, CusumAlarm](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (series: String, rows: Iterator[CusumObs], state: GroupState[Double]) =>
          var s = state.getOption.getOrElse(0.0)
          val out = List.newBuilder[CusumAlarm]
          rows.toSeq.sortBy(_.bucket).foreach { o =>
            s = math.max(0.0, s + (o.c - mu))
            out += CusumAlarm(o.series, o.bucket, o.c, s, s > h)
          }
          state.update(s)
          out.result().iterator
      }
  }
}
