package graft.ops

import graft.SparkSpec

import java.sql.Timestamp

/** Gap-fill laws: contiguous hourly grid, zero-count gaps, LOCF carries the
  * last observed value, event totals survive densification. */
class TimeSeriesSpec extends SparkSpec {

  private def ts(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  test("gapFillLocf: grid, gaps, carry-forward on a handcrafted stream") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, ts(1, 10), 100L), (1L, ts(1, 50), 50L), // hour 1: n=2, v=150
      (1L, ts(4, 0), 70L),                         // hours 2,3 are gaps
      (2L, ts(2, 30), 10L))                        // single-hour user
      .toDF("user_id", "ts", "cents")
    val got = TimeSeries.gapFillLocf(ev, "user_id", "ts", "cents")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2.getTime))
    val u1 = got.filter(_._1 == 1L)
    assert(u1.map(_._2).toSeq === Seq(ts(1), ts(2), ts(3), ts(4)))
    assert(u1.map(_._3).toSeq === Seq(2L, 0L, 0L, 1L))
    assert(u1.map(_._4).toSeq === Seq(150L, 150L, 150L, 70L)) // LOCF through the gap
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, ts(2), 1L, 10L)))
    // densification preserves observed totals: sum over non-gap hours
    assert(u1.filter(_._3 > 0).map(_._4).sum === 220L)
  }

  test("sessionIds: gap starts a new session; same-instant ties are stable") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (10L, 1L, ts(1)), (11L, 1L, ts(2)),           // session 0
      (12L, 1L, ts(10)), (13L, 1L, ts(10)),         // > 6h gap -> session 1; tie
      (14L, 2L, ts(3)))                             // other user
      .toDF("event_id", "user_id", "ts")
    val got = TimeSeries.sessionIds(ev, "user_id", "ts", "event_id", 6 * 3600)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("session_seq"), r.getAs[String]("session_id")))
      .toMap
    assert(got(10L) === ((0L, "1#0")))
    assert(got(11L) === ((0L, "1#0")))
    assert(got(12L) === ((1L, "1#1")))
    assert(got(13L) === ((1L, "1#1"))) // tie joins the same session
    assert(got(14L) === ((0L, "2#0")))
  }

  test("retentionCohorts: handcrafted two-cohort triangle") {
    val s = spark
    import s.implicits._
    def t(d: Int) = Timestamp.valueOf(f"2024-03-$d%02d 12:00:00")
    // week of 2024-03-04 (Mon) and week of 2024-03-11
    val ev = Seq(
      (1L, t(4)), (1L, t(12)),  // cohort w0, returns w1
      (2L, t(5)),               // cohort w0 only
      (3L, t(11)), (3L, t(13))) // cohort w1, active twice same week
      .toDF("user_id", "ts")
    val got = TimeSeries.retentionCohorts(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set(
      ("2024-03-04", 0L, 2L),  // users 1,2 in their first week
      ("2024-03-04", 1L, 1L),  // user 1 returned
      ("2024-03-11", 0L, 1L))) // user 3's cohort, counted once
  }
}
