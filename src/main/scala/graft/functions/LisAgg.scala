package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Per-group longest-strictly-increasing-subsequence typed aggregator:
 * accumulates the group's (order-key, tiebreak, value) triples, sorts
 * once at finish, and runs the O(n log n) patience computation (tails(i)
 * = smallest tail of any increasing subsequence of length i+1; each value
 * binary-searches the first tail ≥ v).
 *
 * Scale rationale (vs the synchronous relaxation it replaced in q416):
 * LIS is a PER-GROUP statistic — nothing about it couples users — so the
 * right distributed shape is ONE shuffle on the group key and local
 * O(n log n) work per group, not max-LIS global rounds each re-joining an
 * O(Σ n_u²) precedence-pair frame. At 100 TB the relaxation moves the
 * pair frame ~20 times; this moves each event exactly once. The
 * relaxation survives as the spec's independent cross-implementation law
 * baseline ([[graft.queries.CatalogDp.lisByRelaxation]]).
 *
 * Memory contract: the buffer holds the whole group (the finish-time sort
 * needs it), so group size is require()-capped at [[LisAgg.MaxEvents]] —
 * the sessionization contract bounds real streams at ~99 events/user; a
 * runaway key fails loudly instead of silently overwhelming an executor.
 */
object LisAgg {

  /** Hard per-group buffer cap — fail loudly, never OOM an executor. */
  val MaxEvents = 65536

  type Ev = (Long, Long, Long) // (order key, tiebreak, value)

  /** (n_events, lis_len) per group. */
  val lis: Aggregator[Ev, Seq[Ev], (Long, Long)] =
    new Aggregator[Ev, Seq[Ev], (Long, Long)] {
      private def guarded(buf: Seq[Ev]): Seq[Ev] = {
        require(buf.size <= MaxEvents,
          s"LIS group exceeds $MaxEvents events — the per-group buffer " +
            "is memory-bound by the sessionization contract; split or " +
            "pre-cap the runaway key")
        buf
      }
      override def zero: Seq[Ev] = Vector.empty
      override def reduce(buf: Seq[Ev], in: Ev): Seq[Ev] = guarded(buf :+ in)
      override def merge(a: Seq[Ev], b: Seq[Ev]): Seq[Ev] = guarded(a ++ b)
      override def finish(buf: Seq[Ev]): (Long, Long) = {
        val vs = buf.sortBy(e => (e._1, e._2)).map(_._3)
        val tails = scala.collection.mutable.ArrayBuffer.empty[Long]
        vs.foreach { v =>
          // first index with tails(idx) >= v (strict increase: equal
          // values cannot extend, they replace)
          var lo = 0
          var hi = tails.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (tails(mid) >= v) hi = mid else lo = mid + 1
          }
          if (lo == tails.length) tails += v else tails(lo) = v
        }
        (buf.size.toLong, tails.length.toLong)
      }
      override def bufferEncoder: Encoder[Seq[Ev]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Ev]]()
      override def outputEncoder: Encoder[(Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    }
}
