package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Observability contracts: observe() reports counts without extra passes. */
class MetricsSpec extends SparkSpec {

  test("observeStage reports row and null counts as a side effect of the action") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val observed = Metrics.observeStage(docs, "scan", watchNulls = Seq("lang"))
    val n = observed.collect().length.toLong // collect executes THIS plan (count() would not)
    val m = Metrics.lastObserved(observed, "scan").get
    assert(m("rows") === n)
    assert(m("lang_nulls") === 0L)
  }

  test("observeGate counts drops that the downstream filter then applies") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val keep = col("n_chars") >= 200
    val gated = Metrics.observeGate(docs, "quality_gate", keep)
    val kept = gated.collect().count(_.getAs[Long]("n_chars") >= 200).toLong
    val m = Metrics.lastObserved(gated, "quality_gate").get
    assert(m("rows").asInstanceOf[Long] - m("dropped").asInstanceOf[Long] === kept)
    assert(gated.filter(keep).count() === kept) // the gate agrees with the filter
    assert(m("dropped").asInstanceOf[Long] > 0L)
  }

  test("streaming: observed metrics surface in StreamingQueryProgress") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val observed = Metrics.observeStage(input.toDF(), "ingest")
    val q = observed.writeStream.format("memory").queryName("obs_test")
      .outputMode("append").start()
    try {
      input.addData(1, 2, 3)
      q.processAllAvailable()
      val progress = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("ingest"))).lastOption
      assert(progress.isDefined)
      assert(progress.get.getAs[Long]("rows") === 3L)
    } finally q.stop()
  }
}
