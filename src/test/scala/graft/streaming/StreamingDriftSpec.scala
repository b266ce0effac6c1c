package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Laws for the streaming KS drift monitor: exactness vs the batch q212
  * formula, no-drift stability, planted-shift detection, and micro-batch
  * split invariance (streamed ≡ one sequential run). */
class StreamingDriftSpec extends SparkSpec {

  /** Brute-force two-sample KS D over raw samples (independent oracle). */
  private def bruteD(a: Seq[Long], b: Seq[Long]): Double = {
    val support = (a ++ b).distinct.sorted
    support.map { v =>
      val f1 = a.count(_ <= v).toDouble / a.size
      val f2 = b.count(_ <= v).toDouble / b.size
      math.abs(f1 - f2)
    }.max
  }

  test("kernel: KS numerator matches the brute-force empirical-CDF gap") {
    val ref = Seq(1L, 1L, 2L, 3L, 5L, 8L, 8L, 9L)
    val cur = Seq(2L, 4L, 4L, 6L, 9L, 9L)
    def hist(s: Seq[Long]) =
      s.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (num, n1, n2) = StreamingDrift.ksNum(hist(ref), hist(cur))
    assert(n1 == ref.size && n2 == cur.size)
    assert(math.abs(num.toDouble / (n1 * n2) - bruteD(ref, cur)) < 1e-12)
  }

  test("no drift: same discrete distribution in reference and windows " +
    "stays below threshold; planted shift fires") {
    // reference and first window: uniform over 0..9; second window: 100..109
    val ref = (0 until 100).map(i => (i % 10).toLong)
    val same = (0 until 50).map(i => (i % 10).toLong)
    val shifted = (0 until 50).map(i => (100 + i % 10).toLong)
    val s0 = StreamingDrift.DriftState(Map.empty, 0L, Map.empty, 0L, 0L)
    val (_, reports) = StreamingDrift.run(s0, ref ++ same ++ shifted, "s",
      refSize = 100, winSize = 50, threshold = 0.3)
    assert(reports.length == 2)
    assert(!reports(0).drifted, reports(0))
    assert(reports(0).d_stat < 0.05)
    assert(reports(1).drifted, reports(1))
    assert(reports(1).d_stat == 1.0) // disjoint support => maximal D
  }

  test("streamed micro-batches emit the same reports as one sequential run") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // per-series workloads: series a drifts, series b does not
    val va = (0 until 60).map(i => (i % 8).toLong) ++
      (0 until 40).map(i => (50 + i % 4).toLong)
    val vb = (0 until 100).map(i => (i % 5).toLong)
    val obs = (va.zipWithIndex.map { case (v, i) => DriftObs("a", i.toLong, v) } ++
      vb.zipWithIndex.map { case (v, i) => DriftObs("b", i.toLong, v) })
    val input = MemoryStream[DriftObs]
    val q = StreamingDrift.monitor(input.toDS(), refSize = 60, winSize = 20,
        threshold = 0.3)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // adversarial split: mid-window, mid-reference, interleaved series
      input.addData(obs.take(37): _*)
      q.processAllAvailable()
      input.addData(obs.slice(37, 103): _*)
      q.processAllAvailable()
      input.addData(obs.drop(103): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("drift_out").as[DriftReport].collect()
      .sortBy(r => (r.series, r.window_index))
    val s0 = StreamingDrift.DriftState(Map.empty, 0L, Map.empty, 0L, 0L)
    val seq = StreamingDrift.run(s0, va, "a", 60, 20, 0.3)._2 ++
      StreamingDrift.run(s0, vb, "b", 60, 20, 0.3)._2
    assert(streamed.toSeq == seq.sortBy(r => (r.series, r.window_index)))
    // series a's post-drift window is flagged; series b never is
    assert(streamed.filter(_.series == "a").exists(_.drifted))
    assert(streamed.filter(_.series == "b").forall(!_.drifted))
  }

  test("state is histogram-sized: distinct support, not arrival count") {
    val many = (0 until 10000).map(i => (i % 16).toLong)
    val s0 = StreamingDrift.DriftState(Map.empty, 0L, Map.empty, 0L, 0L)
    val (s1, _) = StreamingDrift.run(s0, many, "s", 5000, 1000, 0.5)
    assert(s1.ref.size <= 16 && s1.cur.size <= 16)
  }
}
