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

  test("decontaminateGate: stream-safe n-gram gate matches the batch operator") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val leak = (1 to 8).map(i => s"b$i").mkString(" ")
    val benchmark = Seq((100L, s"$leak plus eval framing")).toDF("doc_id", "text")
    // STREAM path: MemoryStream through the literal-array gate
    val input = MemoryStream[(Long, String)]
    val gated = DocsPipeline.decontaminateGate(
      input.toDF().toDF("doc_id", "text"), benchmark)
    assert(gated.isStreaming, "gate must stay streaming-legal")
    val q = gated.writeStream.format("memory").queryName("docs_decontam")
      .outputMode("append").start()
    val docs = Seq(
      1L -> s"intro words $leak and a tail",             // contaminated
      2L -> (1 to 20).map(i => s"c$i").mkString(" "),    // clean
      3L -> "too short to shingle")                       // trivially clean
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val gate = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("contamination_gate")))
        .find(_.getAs[Long]("rows") > 0L)
      assert(gate.isDefined)
      assert(gate.get.getAs[Long]("rows") === 3L)
      assert(gate.get.getAs[Long]("dropped") === 1L)
    } finally q.stop()
    val kept = s.table("docs_decontam").select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
    // law: the streaming gate keeps exactly the docs the batch operator
    // marks clean
    val batchClean = graft.curation.Curation.contaminationFlags(
      docs.toDF("doc_id", "text"), benchmark, "doc_id", "text", n = 8)
      .filter(!col("contaminated")).select("doc_id").as[Long].collect().toSet
    assert(kept === batchClean)
    // a corpus-sized 'benchmark' is rejected loudly, not silently collected
    val boom = intercept[IllegalArgumentException] {
      DocsPipeline.decontaminateGate(
        input.toDF().toDF("doc_id", "text"),
        (1 to 40).map(i => (i.toLong, (1 to 30).map(j => s"t$i-$j").mkString(" ")))
          .toDF("doc_id", "text"),
        maxBenchShingles = 100)
    }
    assert(boom.getMessage.contains("eval set"))
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

  test("nearDupClusterBatch law: streamed keep-set equals batch dropNearDups " +
      "over the union after every prefix; re-delivery is a no-op") {
    val s = spark
    import s.implicits._
    import graft.sinks.KeyedParquetSink
    val docsSink = new KeyedParquetSink(tmpDir("docs-cc-docs"), "doc_id")
    val labelSink = new KeyedParquetSink(tmpDir("docs-cc-labels"), "id")
    val handler = DocsPipeline.nearDupClusterBatch(docsSink, labelSink) _

    // real corpus slice, split into 3 arrival batches such that near-dup
    // pairs span batch boundaries (ids interleave mod 3; the sf0.001
    // documents table carries planted near-dups)
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(240).cache()
    def keepIds(): Set[Long] =
      DocsPipeline.nearDupKeepSet(spark, docsSink, labelSink).get
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    def batchIds(docs: org.apache.spark.sql.DataFrame): Set[Long] =
      graft.dedup.Dedup.dropNearDups(docs)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet

    var seen = corpus.limit(0)
    (0 until 3).foreach { e =>
      val b = corpus.filter(pmod(col("doc_id"), lit(3)) === e)
      handler(b, e.toLong)
      seen = seen.unionByName(b)
      assert(keepIds() === batchIds(seen),
        s"after batch $e the streamed keep-set must equal batch dropNearDups")
    }
    assert(keepIds().size < corpus.count(),
      "the slice must actually contain near-dups for the law to bite")

    // at-least-once: re-deliver batch 1's docs in a NEW epoch — ids are
    // already stored, so state and keep-set must not move
    val before = keepIds()
    handler(corpus.filter(pmod(col("doc_id"), lit(3)) === 1), 3L)
    assert(keepIds() === before, "re-delivered docs must not change state")
    corpus.unpersist()
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
