package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for CUSUM drift detection (q136) and shot boundaries (q137). */
class CusumSpec extends SparkSpec {

  private def events(rows: (String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("event_type", "tss")
      .select(col("event_type"), col("tss").cast("timestamp").as("ts"))
  }

  test("a sustained level shift alarms; the steady prefix does not") {
    // 6 hours at 2 events, then 6 hours at 10 — mean 6, drift accumulates
    val rows = (0 until 6).flatMap(h =>
      Seq.fill(2)("a" -> f"2026-01-01 $h%02d:10:00")) ++
      (6 until 12).flatMap(h => Seq.fill(10)("a" -> f"2026-01-01 $h%02d:10:00"))
    val out = TimeSeries.cusumDrift(events(rows: _*), "event_type", "ts")
      .orderBy("hour").collect()
    val alarms = out.map(r => r.getBoolean(5))
    assert(!alarms.take(6).exists(identity), "steady prefix must not alarm")
    assert(alarms.drop(7).forall(identity), "sustained shift must alarm")
    // cusum recurrence check at the boundary: s grows by (10 - 6) per hour
    val cs = out.map(_.getDouble(4))
    assert(cs(6) === 4.0 && cs(7) === 8.0 && cs(11) === 24.0)
  }

  test("a single spike decays instead of latching") {
    // one hot hour among nine quiet ones: cusum rises once then drains
    val rows = (0 until 10).flatMap { h =>
      val n = if (h == 2) 20 else 1
      Seq.fill(n)("a" -> f"2026-01-01 $h%02d:00:00")
    }
    val out = TimeSeries.cusumDrift(events(rows: _*), "event_type", "ts")
      .orderBy("hour").collect().map(_.getDouble(4))
    assert(out(2) > out(1) && out.last < out(2), s"no decay: ${out.toSeq}")
  }

  test("shot boundaries: planted jump detected, first frame NULL") {
    val s = spark
    import s.implicits._
    // 'a'*32 then '~'*32: one jump at the 32-byte boundary (stride 16)
    val assets = Seq(graft.multimodal.MMAsset(
      1L, "x", ("a" * 32 + "~" * 32).getBytes("UTF-8"), 64L)).toDS()
    val out = graft.multimodal.Multimodal.shotBoundaries(assets, 16, 10)
      .orderBy("frame_off").collect()
    assert(out.length === 4)
    assert(out.head.isNullAt(4)) // no predecessor
    assert(out.map(r => if (r.isNullAt(4)) None else Some(r.getBoolean(4))).toSeq
      === Seq(None, Some(false), Some(true), Some(false)))
  }
}
