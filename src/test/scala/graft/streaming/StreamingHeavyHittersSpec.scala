package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Misra–Gries laws: bounded counter set, one-sided underestimation within
  * N/(k+1), guaranteed capture of true heavy hitters, micro-batch-split
  * invariance (streamed state ≡ one sequential run). */
class StreamingHeavyHittersSpec extends SparkSpec {

  private def trueCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  // a skewed workload: "hot" 40%, "warm" 25%, tail of distinct singletons
  private def workload(n: Int): Seq[String] =
    (0 until n).map { i =>
      if (i % 5 < 2) "hot" else if (i % 4 == 0) "warm" else s"tail$i"
    }

  test("pure kernel: at most k counters; MG error bound; HH capture") {
    val items = workload(400)
    val k = 9
    val (c, n) = StreamingHeavyHitters.mgRun(Map.empty, 0L, items, k)
    assert(n === 400L)
    assert(c.size <= k)
    val t = trueCounts(items)
    val bound = n / (k + 1)
    c.foreach { case (item, est) =>
      val truth = t.getOrElse(item, 0L)
      assert(est <= truth, s"$item overestimated")
      assert(est >= truth - bound, s"$item under by more than N/(k+1)")
    }
    t.filter(_._2 > bound).keys.foreach { hh =>
      assert(c.contains(hh), s"true heavy hitter $hh missing")
    }
  }

  test("streamed micro-batches equal one sequential run; snapshot is a superset of HHs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val items = workload(300)
    val obs = items.zipWithIndex.map { case (it, i) => HhObs("t", i.toLong, it) }
    val input = MemoryStream[HhObs]
    val q = StreamingHeavyHitters.summarize(input.toDS(), k = 7)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(obs.take(100): _*)
      q.processAllAvailable()
      input.addData(obs.slice(100, 180): _*)
      q.processAllAvailable()
      input.addData(obs.drop(180): _*)
      q.processAllAvailable()
    } finally q.stop()
    val snaps = spark.table("hh_out").as[HhSummary].collect()
    // the FINAL snapshot rows are those with n_seen = 300
    val fin = snaps.filter(_.n_seen == 300L).map(s0 => s0.item -> s0.est).toMap
    val (cSeq, nSeq) = StreamingHeavyHitters.mgRun(Map.empty, 0L, items, 7)
    assert(nSeq === 300L)
    assert(fin === cSeq) // split points are invisible to the state
    val t = trueCounts(items)
    t.filter(_._2 > 300L / 8).keys.foreach(hh => assert(fin.contains(hh)))
  }

  test("per-series isolation: summaries never mix across keys") {
    val s = spark
    import s.implicits._
    val a = (0 until 60).map(i => HhObs("a", i.toLong, if (i % 2 == 0) "x" else s"t$i"))
    val b = (0 until 60).map(i => HhObs("b", i.toLong, if (i % 3 == 0) "y" else s"u$i"))
    val out = StreamingHeavyHitters.summarize((a ++ b).toDS(), k = 5)
      .collect()
    val bySeries = out.groupBy(_.series)
    assert(bySeries("a").forall(r => !r.item.startsWith("u") && r.item != "y"))
    assert(bySeries("b").forall(r => !r.item.startsWith("t") && r.item != "x"))
    assert(bySeries("a").exists(_.item == "x") && bySeries("b").exists(_.item == "y"))
  }
}
