package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming CUSUM laws: streamed state equals the sequential recompute
  * over any prefix; batch-split invariance. */
class StreamingCusumSpec extends SparkSpec {

  private def reference(cs: Seq[(Long, Long)], mu: Double, h: Double) = {
    var s = 0.0
    cs.sortBy(_._1).map { case (b, c) =>
      s = math.max(0.0, s + (c - mu)); (b, s, s > h)
    }
  }

  test("batch frame: recurrence, clamp at zero, alarm threshold") {
    val s = spark
    import s.implicits._
    val obs = Seq(
      CusumObs("a", 3L, 9L), CusumObs("a", 1L, 2L), CusumObs("a", 2L, 2L),
      CusumObs("a", 4L, 9L), CusumObs("b", 1L, 5L)).toDS()
    val out = StreamingCusum.drift(obs, mu = 5.0, h = 4.0).collect()
      .map(a => (a.series, a.bucket) -> (a.cusum, a.alarm)).toMap
    val ref = reference(Seq((1L, 2L), (2L, 2L), (3L, 9L), (4L, 9L)), 5.0, 4.0)
    ref.foreach { case (b, cs, al) => assert(out(("a", b)) === ((cs, al))) }
    assert(out(("b", 1L)) === ((0.0, false))) // 5 - 5 = 0, clamped
  }

  test("streamed micro-batches equal the one-shot sequential recompute") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[CusumObs]
    val q = StreamingCusum.drift(input.toDS(), mu = 3.0, h = 5.0)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(CusumObs("x", 1L, 6L), CusumObs("x", 2L, 6L))
      q.processAllAvailable()
      input.addData(CusumObs("x", 3L, 1L), CusumObs("x", 4L, 9L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cusum_out").as[CusumAlarm].collect()
      .map(a => a.bucket -> (a.cusum, a.alarm)).toMap
    val ref = reference(Seq((1L, 6L), (2L, 6L), (3L, 1L), (4L, 9L)), 3.0, 5.0)
      .map { case (b, cs, al) => b -> (cs, al) }.toMap
    assert(got === ref)
  }
}
