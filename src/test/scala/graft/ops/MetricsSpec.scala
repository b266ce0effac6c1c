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

  test("StageLogger.stage: start/ok events, then failed + fail-fast rethrow on poison") {
    val events = scala.collection.mutable.ArrayBuffer.empty[StageEvent]
    val log = new StageLogger(events.append(_))
    assert(log.stage("build_source") { 42 } === 42)
    assert(events.map(e => (e.stage, e.status)).toSeq ===
      Seq(("build_source", "start"), ("build_source", "ok")))
    events.clear()
    val boom = intercept[StageFailedException] {
      log.stage("decode") { throw new IllegalStateException("bad schema") }
    }
    assert(boom.stage === "decode")
    assert(events.map(_.status).toSeq === Seq("start", "failed"))
    assert(events.last.error.get.contains("bad schema"))
    // failFast: the reference's sys.exit(1) contract, handler injectable
    case class Exited(code: Int) extends RuntimeException
    val exit = intercept[Exited] {
      log.failFast[Int]("enrich", code => throw Exited(code)) {
        throw new IllegalStateException("poisoned stage")
      }
    }
    assert(exit.code === 1)
    // events render as parseable structured lines
    assert(events.last.render.contains(""""status":"failed""""))
  }

  test("StageLogger.attach: one event per observed stage per completed action") {
    val events = scala.collection.mutable.ArrayBuffer.empty[StageEvent]
    val log = new StageLogger(e => events.synchronized { events.append(e); () })
    val listener = log.attach(spark)
    try {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      val staged = Metrics.observeStage(
        Metrics.observeStage(docs, "scan").filter(col("n_chars") >= 0), "gated")
      val n = staged.collect().length.toLong
      // QueryExecutionListener delivery is async on the listener bus — poll
      val deadline = System.currentTimeMillis() + 20000
      while (events.synchronized(events.count(_.status == "ok")) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val byStage = events.filter(_.status == "ok").groupBy(_.stage)
      assert(byStage.keySet === Set("scan", "gated"))
      assert(byStage("scan").map(_.metrics("rows")) === Seq(n))
      assert(byStage("gated").map(_.metrics("rows")) === Seq(n))
    } finally spark.listenerManager.unregister(listener)
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
