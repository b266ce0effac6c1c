package graft.ops

import graft.SparkSpec

import java.sql.Timestamp

/** Laws for ewmaSmooth (constant fixed point, power-of-two step decay,
  * first-row identity) and eventRuns (RLE partition, conservation). */
class EwmaRunsSpec extends SparkSpec {

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  private def ewmaOf(counts: Seq[(Int, Int)]): Seq[(Timestamp, Long, Double)] = {
    val s = spark
    import s.implicits._
    // one event per (hour, i) so hour h holds `n` events
    val ev = counts.flatMap { case (h, n) =>
      (0 until n).map(i => ("a", ts(h, i)))
    }.toDF("series", "ts")
    TimeSeries.ewmaSmooth(ev, "series", "ts", lags = 8)
      .collect()
      .map(r => (r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1.getTime)
  }

  test("constant series is an EWMA fixed point; first row equals its count") {
    val got = ewmaOf((1 to 10).map(h => (h, 5)))
    assert(got.head._3 === 5.0) // single available lag -> the value itself
    got.foreach { case (_, c, e) => assert(c === 5L && e === 5.0) }
  }

  test("unit impulse decays by exact powers of two once the window is full") {
    // 8 warmup hours of 0? zero-count hours don't exist; use 1-event hours
    // then a 9-event spike: deviation from baseline halves each step.
    val got = ewmaOf((1 to 9).map(h => (h, 1)) :+ (10, 9) :++ (11 to 17).map(h => (h, 1)))
    val byHour = got.map(g => g._1 -> g._3).toMap
    // full window before the spike: ewma = 1 exactly
    assert(byHour(ts(9)) === 1.0)
    // spike hour: newest weight is 128/255
    assert(byHour(ts(10)) === (128.0 * 9 + 127.0) / 255.0)
    // each following hour the spike's weight halves: 64, 32, 16, ...
    (1 to 7).foreach { d =>
      val w = (128 >> d).toDouble
      assert(byHour(ts(10 + d)) === (w * 9 + (255.0 - w)) / 255.0,
        s"hour ${10 + d}")
    }
  }

  test("eventRuns: crafted runs split exactly at type changes") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, ts(1, 0), 1L, "a"), (1L, ts(1, 1), 2L, "a"), (1L, ts(1, 2), 3L, "b"),
      (1L, ts(1, 3), 4L, "a"), (2L, ts(1, 0), 5L, "b"), (2L, ts(1, 1), 6L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val runs = TimeSeries.eventRuns(ev, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
      .sortBy(x => (x._1, x._2, x._3))
    assert(runs.toSeq === Seq((1L, "a", 1L), (1L, "a", 2L), (1L, "b", 1L),
      (2L, "b", 2L)))
  }

  test("eventRuns conservation: run lengths sum to the event count") {
    val s = spark
    import s.implicits._
    val ev = (1 to 50).map(i =>
      (i % 3L, ts(1 + i / 10, i % 10), i.toLong, if (i % 7 < 3) "x" else "y"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val total = TimeSeries.eventRuns(ev, "user_id", "ts", "event_id", "event_type")
      .agg(org.apache.spark.sql.functions.sum("run_len"))
      .collect().head.getLong(0)
    assert(total === 50L)
  }
}
