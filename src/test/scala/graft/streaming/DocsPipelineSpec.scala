package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end contract of the streaming document-curation pipeline. */
class DocsPipelineSpec extends SparkSpec {

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  private val goodText =
    (1 to 70).map(_ => "the data value table row hash").mkString(" ")

  test("curate: quality gate drops junk, dedup collapses same-content docs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val curated = DocsPipeline.curate(
      input.toDF().toDF("doc_id", "text", "ingest_ts"), minQuality = 0.5)
    val q = curated.writeStream.format("memory").queryName("docs_curate")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, goodText, ts("2024-01-01 00:00:00")),
        (2L, "x", ts("2024-01-01 00:00:01")), // junk: fails the gate
        (3L, goodText + "  ", ts("2024-01-01 00:00:02"))) // dup after normalize
      q.processAllAvailable()
      // the gate's observe node reports per-batch drop rates in progress
      // (the dedup state op appends an empty watermark-advance batch, so
      // find the data-carrying one rather than taking the last)
      val gate = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("quality_gate"))).find(_.getAs[Long]("rows") > 0L)
      assert(gate.isDefined, "quality_gate metrics missing from progress")
      assert(gate.get.getAs[Long]("rows") === 3L)
      assert(gate.get.getAs[Long]("dropped") === 1L)
    } finally q.stop()
    val ids = s.table("docs_curate").select("doc_id").as[Long].collect().toSet
    assert(ids.size === 1, s"expected one curated doc, got $ids")
    assert(ids.subsetOf(Set(1L, 3L))) // one of the two identical docs survives
  }

  test("curateNearDup: SimHash key collapses near-identical (not byte-equal) docs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val curated = DocsPipeline.curateNearDup(
      input.toDF().toDF("doc_id", "text", "ingest_ts"), minQuality = 0.5)
    val q = curated.writeStream.format("memory").queryName("docs_neardup")
      .outputMode("append").start()
    try {
      // doc 2 is doc 1's token bag REORDERED — different content_hash
      // (exact dedup would keep both), identical simhash by construction
      val variant = goodText.split(" ").reverse.mkString(" ")
      assert(variant !== goodText)
      input.addData(
        (1L, goodText, ts("2024-01-01 00:00:00")),
        (2L, variant, ts("2024-01-01 00:00:01")),
        (3L, (1 to 70).map(i => s"tok$i distinct words here now").mkString(" "),
          ts("2024-01-01 00:00:02")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = s.table("docs_neardup").select("doc_id").as[Long].collect().toSet
    assert(rows.size === 2, s"expected near-dup collapse to 2 docs, got $rows")
    assert(rows.contains(3L))
    assert((rows - 3L).subsetOf(Set(1L, 2L)))
  }

  test("runToKeyedSink: end-to-end upsert keyed by content hash across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val sinkPath = tmpDir("docs-sink")
    val query = DocsPipeline.runToKeyedSink(
      input.toDF().toDF("doc_id", "text", "ingest_ts"), minQuality = 0.5,
      sinkPath = sinkPath, checkpointDir = tmpDir("docs-ckpt"))
    try {
      input.addData((1L, goodText, ts("2024-01-01 00:00:00")))
      query.processAllAvailable()
      // same content again in a later batch: keyed sink keeps one row
      input.addData((9L, goodText, ts("2024-01-01 00:00:30")))
      query.processAllAvailable()
    } finally query.stop()
    val state = new graft.sinks.KeyedParquetSink(sinkPath, "content_hash")
      .read(spark).get.collect()
    assert(state.length === 1)
    assert(state.head.getAs[Long]("doc_id") === 1L) // second batch's dup upserted, not duplicated
  }
}
