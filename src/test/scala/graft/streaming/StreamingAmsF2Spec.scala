package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming AMS F2 laws: the state is the batch signed sums of the
  * whole prefix (batch-equivalence — proven against the q443 batch
  * kernel [[graft.queries.CatalogRx.amsSums]] itself, same md5 salt),
  * micro-batch splits don't change it (the sum commutes), series are
  * isolated, state is EXACTLY 16 longs, and a single repeated item
  * estimates its F2 exactly (sign² = 1). */
class StreamingAmsF2Spec extends SparkSpec {

  private def batchSums(items: Seq[String]): Vector[Long] =
    StreamingAmsF2.step(Vector.fill(StreamingAmsF2.Estimators)(0L), items)

  test("pure kernel: signed sums equal the q443 batch kernel's") {
    val s = spark
    import s.implicits._
    // occurrences of long-keyed values, exactly the q443 shape
    val vals = (0 until 400).map(i => (i % 37).toLong)
    val fv = vals.groupBy(identity).view
      .mapValues(_.length.toLong).toSeq.toDF("v", "f")
    val fromBatch = graft.queries.CatalogRx
      .amsSums(fv, StreamingAmsF2.Estimators).collect()
      .map(r => r.getAs[Long]("j") -> r.getAs[Long]("s_j")).toMap
    val fromStream = batchSums(vals.map(_.toString))
    (0 until StreamingAmsF2.Estimators)
      .foreach(j => assert(fromStream(j) === fromBatch(j.toLong)))
  }

  test("fast kernel equals the one-shot sign() fold") {
    val items = (0 until 97).map(i => s"z${i % 17}")
    val want = items.foldLeft(Vector.fill(StreamingAmsF2.Estimators)(0L)) {
      (s, it) => Vector.tabulate(StreamingAmsF2.Estimators)(j =>
        s(j) + StreamingAmsF2.sign(j, it))
    }
    assert(batchSums(items) === want)
  }

  test("single repeated item: est_f2 is exactly f² for every estimator") {
    val sums = batchSums(Seq.fill(9)("only"))
    sums.foreach(sj => assert(sj * sj === 81L))
  }

  test("streamed micro-batches equal one batch fold (split invariance)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val items = (0 until 300).map(i => s"k${i % 41}")
    val obs = items.zipWithIndex.map { case (it, i) => AmsObs("t", i.toLong, it) }
    val input = MemoryStream[AmsObs]
    val q = StreamingAmsF2.summarize(input.toDS())
      .writeStream.format("memory").queryName("ams_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(obs.take(111): _*)
      q.processAllAvailable()
      input.addData(obs.drop(111): _*)
      q.processAllAvailable()
    } finally q.stop()
    val snaps = spark.table("ams_out").as[AmsSnapshot].collect()
    val fin = snaps.filter(_.n_arrivals == 300L)
    assert(fin.length === StreamingAmsF2.Estimators)
    val want = batchSums(items)
    fin.foreach { e =>
      assert(e.s_j === want(e.j))
      assert(e.est_f2 === e.s_j * e.s_j)
    }
  }

  test("series isolation and state geometry") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val a = (0 until 50).map(i => AmsObs("a", i.toLong, s"x${i % 7}"))
    val b = (0 until 70).map(i => AmsObs("b", i.toLong, s"y${i % 11}"))
    val input = MemoryStream[AmsObs]
    val q = StreamingAmsF2.summarize(input.toDS())
      .writeStream.format("memory").queryName("ams_iso")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((a ++ b): _*)
      q.processAllAvailable()
    } finally q.stop()
    val snaps = spark.table("ams_iso").as[AmsSnapshot].collect()
    // exactly 16 rows per series per batch — the state is 16 longs
    assert(snaps.count(_.series == "a") === StreamingAmsF2.Estimators)
    assert(snaps.count(_.series == "b") === StreamingAmsF2.Estimators)
    val wantA = batchSums(a.map(_.item))
    val wantB = batchSums(b.map(_.item))
    snaps.filter(_.series == "a").foreach(e => assert(e.s_j === wantA(e.j)))
    snaps.filter(_.series == "b").foreach(e => assert(e.s_j === wantB(e.j)))
  }

  test("merge by addition: shard sketches sum to the whole") {
    val xs = (0 until 120).map(i => s"m${i % 13}")
    val (l, r) = xs.splitAt(47)
    val (sl, sr, sw) = (batchSums(l), batchSums(r), batchSums(xs))
    (0 until StreamingAmsF2.Estimators)
      .foreach(j => assert(sl(j) + sr(j) === sw(j)))
  }
}
