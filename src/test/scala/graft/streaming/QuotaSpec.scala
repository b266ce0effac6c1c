package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Laws for the streaming per-domain admission quota (X116). */
class QuotaSpec extends SparkSpec {

  test("batch form: first cap docs per domain by id, ranks contiguous") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      QuotaDoc(5L, "a"), QuotaDoc(1L, "a"), QuotaDoc(9L, "a"), QuotaDoc(3L, "a"),
      QuotaDoc(2L, "b"), QuotaDoc(7L, "b")).toDS()
    val out = Quota.domainQuota(docs, cap = 2).collect().toSet
    assert(out === Set(
      QuotaOut(1L, "a", 1L), QuotaOut(3L, "a", 2L),
      QuotaOut(2L, "b", 1L), QuotaOut(7L, "b", 2L)))
  }

  test("stream: quota holds ACROSS micro-batches, later arrivals rejected") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[QuotaDoc]
    val q = Quota.domainQuota(in.toDS(), cap = 3)
      .writeStream.format("memory").queryName("quota_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: domain a gets 2 of its 3 slots
      in.addData(QuotaDoc(10L, "a"), QuotaDoc(11L, "a"), QuotaDoc(20L, "b"))
      q.processAllAvailable()
      // batch 2: a's third slot fills; the fourth and fifth arrivals drop
      in.addData(QuotaDoc(12L, "a"), QuotaDoc(13L, "a"), QuotaDoc(14L, "a"))
      q.processAllAvailable()
      // batch 3: still full — nothing admitted for a; b keeps filling
      in.addData(QuotaDoc(15L, "a"), QuotaDoc(21L, "b"))
      q.processAllAvailable()
      val rows = s.sql("SELECT doc_id, domain, rank_in_domain FROM quota_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows === Set(
        (10L, "a", 1L), (11L, "a", 2L), (12L, "a", 3L),
        (20L, "b", 1L), (21L, "b", 2L)), s"got $rows")
    } finally q.stop()
  }

  test("a mega-domain batch admits exactly cap, smallest ids first") {
    val s = spark
    import s.implicits._
    val docs = (1L to 1000L).map(i => QuotaDoc(i, "huge")).toDS()
    val out = Quota.domainQuota(docs, cap = 5).collect().sortBy(_.rank_in_domain)
    assert(out.map(_.doc_id).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }
}
