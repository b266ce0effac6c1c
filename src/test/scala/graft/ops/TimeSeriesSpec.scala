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
}
