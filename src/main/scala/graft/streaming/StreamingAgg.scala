package graft.streaming

import graft.ops.Incremental
import graft.sinks.KeyedParquetSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming incremental view maintenance: the q92 merge law run per
 * micro-batch through `foreachBatch` into the crash-atomic keyed sink —
 * a continuously-maintained per-key (n, total) aggregate whose stored
 * state always equals the full recompute over everything ingested.
 *
 * Per batch, only the TOUCHED keys move: the batch collapses to its own
 * per-key delta, the sink contributes just the matching prior state rows
 * (left-semi against the delta's keys), and the merged rows upsert back.
 * Write volume is delta-keyed, not state-sized — the property that keeps
 * a 100 TB rolling aggregate affordable.
 *
 * Exactly-once: the sink's epoch high-water guard makes a replayed batch
 * a no-op — on retry the handler re-reads the ALREADY-MERGED state and
 * recomputes a (wrong) double-merge, but the upsert of a committed epoch
 * is rejected, so stored state never double-counts (law-tested).
 */
object StreamingAgg {

  /** The foreachBatch handler, usable directly in tests. */
  def mergeBatch(sink: KeyedParquetSink, keyCol: String, valueCol: String)(
      batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = batch.select(col(keyCol), col(valueCol))
    val prev = sink.read(spark) match {
      case Some(st) =>
        st.select(col(keyCol), col("n"), col("total"))
          // only the keys this batch touches participate in the merge;
          // null-safe (<=>) so a NULL key's prior state still merges (plain
          // equality would drop it and the upsert would overwrite instead)
          .join(delta.select(col(keyCol).as("__dk")).distinct(),
            col(keyCol) <=> col("__dk"), "left_semi")
      case None =>
        // first batch: zero-row state with the MERGED shape derived from
        // the delta itself (key type from the stream, n/total from the
        // aggregate) — no hardcoded (Long,Long,Long) that a string key or
        // fractional valueCol would silently union-coerce against
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          delta.groupBy(col(keyCol))
            .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
            .schema)
    }
    sink.upsert(Incremental.mergeCountSum(prev, delta, keyCol, valueCol), epochId)
  }

  /** Stream wiring: maintain the per-key aggregate of `valueCol` keyed by
    * `keyCol` at `sinkPath`. */
  def runCountSum(events: DataFrame, keyCol: String, valueCol: String,
      sinkPath: String, checkpointDir: String): StreamingQuery = {
    val sink = new KeyedParquetSink(sinkPath, keyCol)
    events.writeStream
      .queryName("graft-incremental-agg")
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(mergeBatch(sink, keyCol, valueCol) _)
      .start()
  }
}
