package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Streaming EWMA laws: streamed points equal the batch operator over any
  * prefix (identical integer numerator/denominator, one divide), state
  * stays bounded, micro-batch splits are invisible. */
class StreamingEwmaSpec extends SparkSpec {

  private def reference(cs: Seq[(Long, Long)], lags: Int): Map[Long, Double] = {
    var hist = List.empty[Long]
    cs.sortBy(_._1).map { case (b, c) =>
      hist = (c :: hist).take(lags)
      val num = hist.zipWithIndex.map { case (v, k) => v * (1L << (lags - 1 - k)) }.sum
      val den = hist.indices.map(k => 1L << (lags - 1 - k)).sum
      b -> num.toDouble / den.toDouble
    }.toMap
  }

  test("streamed micro-batches equal the sequential reference") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val obs = (1L to 12L).map(b => EwmaObs("x", b, b % 5 + 1))
    val input = MemoryStream[EwmaObs]
    val q = StreamingEwma.smooth(input.toDS(), lags = 4)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(obs.take(5): _*); q.processAllAvailable()
      input.addData(obs.slice(5, 7): _*); q.processAllAvailable()
      input.addData(obs.drop(7): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ewma_out").as[EwmaPoint].collect()
      .map(p => p.bucket -> p.ewma).toMap
    assert(got === reference(obs.map(o => (o.bucket, o.c)), lags = 4))
  }

  test("streamed values equal the batch window operator on the same series") {
    val s = spark
    import s.implicits._
    // events: hour h carries (h % 3 + 1) raw events
    val ev = (1 to 10).flatMap { h =>
      (0 until (h % 3 + 1)).map(i =>
        ("a", Timestamp.valueOf(f"2024-03-01 $h%02d:0$i:00")))
    }.toDF("series", "ts")
    val batch = graft.ops.TimeSeries.ewmaSmooth(ev, "series", "ts", lags = 8)
      .collect().map(r => r.getTimestamp(1).getTime -> r.getDouble(3)).toMap
    val obs = (1 to 10).map(h => EwmaObs("a",
      Timestamp.valueOf(f"2024-03-01 $h%02d:00:00").getTime, (h % 3 + 1).toLong))
    val streamed = StreamingEwma.smooth(obs.toDS(), lags = 8)
      .collect().map(p => p.bucket -> p.ewma).toMap
    assert(streamed === batch)
  }

  test("state stays bounded at lags entries") {
    val long = (1L to 500L).map(b => EwmaObs("s", b, 7L))
    val s = spark
    import s.implicits._
    val out = StreamingEwma.smooth(long.toDS(), lags = 8).collect()
    assert(out.length === 500)
    // constant series: once warm, the fixed point is exactly the constant
    assert(out.filter(_.bucket >= 8L).forall(_.ewma === 7.0))
  }
}
