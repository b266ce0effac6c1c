package graft.streaming

import graft.SparkSpec
import graft.ops.Fingerprint
import graft.sinks.KeyedParquetSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming fingerprint maintenance laws: stored digests equal the batch
  * recompute after every micro-batch; a replayed epoch is a no-op. */
class StreamingFingerprintSpec extends SparkSpec {

  private def stateOf(sink: KeyedParquetSink): Map[String, (Long, Long)] =
    sink.read(spark).get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def batchFp(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    Fingerprint.datasetFingerprint(df, "doc_id", "text", "source")
      .filter(col("source") =!= "*").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("streamed state equals batch fingerprint after each batch; replay no-op") {
    val s = spark
    import s.implicits._
    val sink = new KeyedParquetSink(tmpDir("stream-fp"), "source")
    val handler = StreamingFingerprint.mergeBatch(sink, "doc_id", "text", "source") _

    val b1 = Seq((1L, "alpha", "a"), (2L, "beta", "a"), (3L, "gamma", "b"))
      .toDF("doc_id", "text", "source")
    handler(b1, 0L)
    assert(stateOf(sink) === batchFp(b1))

    val b2 = Seq((4L, "delta", "a"), (5L, "eps", "c")).toDF("doc_id", "text", "source")
    handler(b2, 1L)
    assert(stateOf(sink) === batchFp(b1.union(b2)))

    handler(b2, 1L) // replayed epoch: high-water guard rejects
    assert(stateOf(sink) === batchFp(b1.union(b2)))
  }

  test("end-to-end over MemoryStream: digests match the batch operator") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val sinkPath = tmpDir("stream-fp-e2e")
    val q = StreamingFingerprint.run(
      input.toDF().toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", sinkPath, tmpDir("stream-fp-ckpt"))
    try {
      input.addData((1L, "x", "s1"), (2L, "y", "s2"))
      q.processAllAvailable()
      input.addData((3L, "z", "s1"))
      q.processAllAvailable()
    } finally q.stop()
    val all = Seq((1L, "x", "s1"), (2L, "y", "s2"), (3L, "z", "s1"))
      .toDF("doc_id", "text", "source")
    assert(stateOf(new KeyedParquetSink(sinkPath, "source")) === batchFp(all))
  }
}
