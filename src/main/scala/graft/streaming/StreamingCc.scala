package graft.streaming

import graft.sinks.KeyedParquetSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming connected-components maintenance — cluster labels for a
 * dedup store kept continuously current as near-dup EDGES arrive
 * (round-13 flagship streaming integration; the streaming face of
 * q446's daily batch maintenance). Each micro-batch of (x, y) edges:
 *
 *  1. read the stored canonical labels (KeyedParquetSink, keyed by id —
 *     the exactly-once upsert contract of [[graft.sinks.KeyedParquetSink]]);
 *  2. [[graft.graph.Graph.incrementalMerge]]: re-cluster ONLY the
 *     components the batch touches (stars of touched components + the
 *     delta through hookComponents — insert-only merges need no stored
 *     edges);
 *  3. upsert exactly the changed/new label rows; the sink's epoch
 *     high-water guard makes a replayed batch a no-op, so the state is
 *     exactly-once in EFFECT on top of at-least-once delivery.
 *
 * The maintained invariant (StreamingCcSpec's law): after any prefix of
 * batches, the stored labels equal a one-shot batch CC over the union
 * of every edge ingested so far — path-independence of the canonical
 * min-label fixpoint, the same argument q446's oracle makes.
 *
 * Scale shape: state is one row per node ever seen in an edge (the
 * entity universe); per batch, reads semi-join down to the touched
 * components and writes touch only the k/numBuckets state buckets the
 * changed keys hash to. A pathological batch that bridges two mega
 * components pays that merge once — exactly the cost the batch
 * recompute would pay every day.
 */
object StreamingCc {

  /** The foreachBatch handler, usable directly in tests. */
  def mergeBatch(sink: KeyedParquetSink, xCol: String = "x",
      yCol: String = "y")(batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = batch.select(col(xCol), col(yCol))
    val stored = sink.read(spark) match {
      case Some(st) => st.select(col("id"), col("component"))
      case None => delta.select(col(xCol).cast("long").as("id"),
        col(xCol).cast("long").as("component")).limit(0)
    }
    sink.upsert(
      graft.graph.Graph.incrementalMerge(stored, delta, xCol, yCol),
      epochId)
  }

  /** Stream wiring: maintain node→component labels at `sinkPath`. */
  def run(edges: DataFrame, xCol: String, yCol: String, sinkPath: String,
      checkpointDir: String): StreamingQuery =
    edges.writeStream
      .queryName("graft-streaming-cc")
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(mergeBatch(new KeyedParquetSink(sinkPath, "id"),
        xCol, yCol) _)
      .start()
}
