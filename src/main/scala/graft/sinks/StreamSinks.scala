package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/**
 * Streaming sink wiring.
 *
 * Re-derivation of the reference's sink layer:
 *  - console debug sink with complete/append mode
 *    (`write_enriched_df_to_console`, /root/reference/bexley_spark_stream_msk_es.py:465-476)
 *  - `foreachBatch` micro-batch custom sink driving a keyed idempotent writer
 *    (`write_enriched_df_to_sink` + `write_df_to_es`, reference :506-531)
 *  - checkpointLocation on the STREAM writer (fixing the reference's
 *    misplacement inside the per-batch writer, :517 — see SURVEY.md §2.9 T4)
 *
 * Output mode is selected per plan shape rather than hardcoded (the
 * reference's two sink paths have different legal modes, :468 comment):
 * aggregated plans stream with complete/update; non-aggregated with append.
 */
object StreamSinks {

  /** Console debug sink (reference :465-476). */
  def console(df: DataFrame, outputMode: String = "append", truncate: Boolean = false): DataStreamWriter[Row] =
    df.writeStream
      .format("console")
      .outputMode(outputMode)
      .option("truncate", truncate.toString)

  /** foreachBatch → keyed idempotent upsert, with checkpointing (T4-T6). */
  def keyedUpsert(
      df: DataFrame,
      sink: KeyedParquetSink,
      checkpointDir: String,
      queryName: String = "graft-keyed-sink",
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    df.writeStream
      .queryName(queryName)
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        sink.upsert(batch, epochId)
      }
      .start()
}
