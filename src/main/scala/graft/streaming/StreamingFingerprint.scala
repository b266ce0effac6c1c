package graft.streaming

import graft.ops.Fingerprint
import graft.sinks.KeyedParquetSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming dataset-fingerprint maintenance — q130's XOR content digests
 * kept continuously up to date over an ingest stream (the StreamingAgg
 * pattern applied to the versioning primitive): each micro-batch
 * collapses to a per-source (count, bit_xor) delta, prior state for the
 * touched sources merges by count-add / digest-XOR, and the result
 * upserts through the crash-atomic keyed sink. Because XOR is its own
 * inverse and order-free, the stored fingerprint after any prefix of
 * batches equals the batch recompute over everything ingested (the
 * incremental-maintenance law, spec-tested), and the sink's epoch
 * high-water guard makes a replayed batch a no-op.
 *
 * Scale shape: state is one row per source; per batch only touched
 * sources are read (left-semi) and written. A 100 TB corpus's snapshot
 * identity rides on |sources| rows of state.
 */
object StreamingFingerprint {

  /** The foreachBatch handler, usable directly in tests. */
  def mergeBatch(sink: KeyedParquetSink, idCol: String, textCol: String,
      domainCol: String)(batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = Fingerprint.deltaFingerprint(batch, idCol, textCol, domainCol)
    val prev = sink.read(spark) match {
      case Some(st) =>
        st.select(col("source"), col("n_docs"), col("xor_fp"))
          .join(delta.select(col("source").as("__dk")).distinct(),
            col("source") <=> col("__dk"), "left_semi")
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], delta.schema)
    }
    sink.upsert(Fingerprint.mergeFingerprint(prev, delta), epochId)
  }

  /** Stream wiring: maintain per-source fingerprints at `sinkPath`. */
  def run(docs: DataFrame, idCol: String, textCol: String, domainCol: String,
      sinkPath: String, checkpointDir: String): StreamingQuery = {
    val sink = new KeyedParquetSink(sinkPath, "source")
    docs.writeStream
      .queryName("graft-streaming-fingerprint")
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(mergeBatch(sink, idCol, textCol, domainCol) _)
      .start()
  }
}
