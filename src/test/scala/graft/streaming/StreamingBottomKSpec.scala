package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Bottom-k (KMV) sketch laws: the state IS the batch bottom-k of the
  * prefix (batch-equivalence), micro-batch splits don't change it
  * (split invariance), the state never exceeds k entries, and the k-th
  * minimum estimator tracks the true distinct count. */
class StreamingBottomKSpec extends SparkSpec {

  private def batchBottomK(items: Seq[String], k: Int): Vector[(Long, String)] =
    items.distinct.map(i => (StreamingBottomK.u32(i), i))
      .sorted.take(k).toVector

  test("pure kernel: state == batch bottom-k of the prefix; size <= k") {
    val items = (0 until 500).map(i => s"tok${i % 137}")
    val k = 16
    val (sk, _) = StreamingBottomK.step(Vector.empty, 0L, items, k)
    assert(sk.size <= k)
    assert(sk == batchBottomK(items, k))
  }

  test("kmv estimator: (k-1)*2^32/h_(k) within 35% of true distincts") {
    val items = (0 until 3000).map(i => s"item$i")
    val k = 64
    val (sk, _) = StreamingBottomK.step(Vector.empty, 0L, items, k)
    val hk = sk.last._1.toDouble
    val est = (k - 1).toDouble * 4294967296.0 / hk
    val truth = items.distinct.size.toDouble
    assert(math.abs(est - truth) / truth <= 0.35,
      s"KMV estimate $est vs $truth out of tolerance")
  }

  test("streamed micro-batches equal one sequential run (split invariance)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val items = (0 until 300).map(i => s"w${i % 91}")
    val obs = items.zipWithIndex.map { case (it, i) => BkObs("t", i.toLong, it) }
    val input = MemoryStream[BkObs]
    val q = StreamingBottomK.summarize(input.toDS(), k = 12)
      .writeStream.format("memory").queryName("bk_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(obs.take(97): _*)
      q.processAllAvailable()
      input.addData(obs.slice(97, 211): _*)
      q.processAllAvailable()
      input.addData(obs.drop(211): _*)
      q.processAllAvailable()
    } finally q.stop()
    val snaps = spark.table("bk_out").as[BkEntry].collect()
    val lastN = snaps.map(_.n_distinct_seen).max
    val fin = snaps.filter(_.n_distinct_seen == lastN)
      .sortBy(_.k_rank).map(e => (e.h, e.item)).toVector
    assert(fin == batchBottomK(items, 12),
      "streamed sketch differs from the batch bottom-k of the full prefix")
    // per-series isolation: a second series must not perturb the first
  }

  test("series isolation: sketches are independent per series") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val a = (0 until 80).map(i => BkObs("a", i.toLong, s"x${i % 23}"))
    val b = (0 until 80).map(i => BkObs("b", i.toLong, s"y${i % 31}"))
    val input = MemoryStream[BkObs]
    val q = StreamingBottomK.summarize(input.toDS(), k = 8)
      .writeStream.format("memory").queryName("bk_iso")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((a ++ b): _*)
      q.processAllAvailable()
    } finally q.stop()
    val snaps = spark.table("bk_iso").as[BkEntry].collect()
    val skA = snaps.filter(_.series == "a").sortBy(_.k_rank)
      .map(e => (e.h, e.item)).toVector
    val skB = snaps.filter(_.series == "b").sortBy(_.k_rank)
      .map(e => (e.h, e.item)).toVector
    assert(skA == batchBottomK(a.map(_.item), 8))
    assert(skB == batchBottomK(b.map(_.item), 8))
  }
}
