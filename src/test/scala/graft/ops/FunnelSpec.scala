package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Funnel laws: in-order reach times, out-of-order events do NOT convert,
  * equal timestamps count (>= semantics), summary counts are monotone. */
class FunnelSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      // u1: clean view(1) -> click(2) -> purchase(3): depth 3
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2: purchase BEFORE view: view(5), purchase(4) -> depth 1
      (2L, "purchase", ts(4)), (2L, "view", ts(5)),
      // u3: click only, never viewed -> depth 0
      (3L, "click", ts(1)),
      // u4: view and click at the SAME instant (>= counts it): depth 2
      (4L, "view", ts(7)), (4L, "click", ts(7)),
      // u5: noise types only
      (5L, "error", ts(1)),
      // u6: second click after purchase-eligible view; first click too early
      (6L, "click", ts(1)), (6L, "view", ts(2)), (6L, "click", ts(9)),
      (6L, "purchase", ts(10)))
      .toDF("user_id", "event_type", "ts")
  }

  test("stageTimes: order-sensitive reach times and depth") {
    val got = Funnel.stageTimes(fixture, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)), r.getLong(4)))
      .toMap
    assert(got(1L) === ((Some(ts(1)), Some(ts(2)), Some(ts(3)), 3L)))
    assert(got(2L) === ((Some(ts(5)), None, None, 1L)))
    assert(got(3L) === ((None, None, None, 0L)))
    assert(got(4L) === ((Some(ts(7)), Some(ts(7)), None, 2L)))
    assert(got(5L) === ((None, None, None, 0L)))
    // u6: the pre-view click is ignored; the later click converts
    assert(got(6L) === ((Some(ts(2)), Some(ts(9)), Some(ts(10)), 3L)))
  }

  test("conversionCounts: funnel bars are monotone non-increasing") {
    val row = Funnel.conversionCounts(fixture, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).head()
    assert(row.getLong(0) === 6L) // users
    val bars = Seq(row.getLong(1), row.getLong(2), row.getLong(3))
    assert(bars === Seq(4L, 3L, 2L))
    assert(bars.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
  }
}
