package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming ingestion into the `graft-kv` DataSource V2 table
 * ([[graft.sources.KvSource]]): every micro-batch becomes ONE atomic
 * graft-kv append commit (a new LSM generation), so the stored state is
 * always a committed snapshot and keyed upserts converge exactly as the
 * reference's es.mapping.id sink does (reference
 * bexley_spark_stream_msk_es.py:508-517) — but through the connector
 * write path instead of a hand-rolled sink.
 *
 * Exactly-once discipline, two layers:
 *  - an epoch high-water marker (`_epoch`, atomic rename) makes a
 *    REPLAYED epoch a true no-op (the KeyedSink guard re-expressed);
 *  - even without the marker (crash between commit and marker bump), a
 *    re-append of the same batch writes identical values into a new
 *    generation — last-write-wins converges to the same state, so the
 *    recovery path is idempotent by value.
 */
object KvStreamSink {

  /** The per-batch handler (public for direct spec-level law testing). */
  def handleBatch(path: String, keyCol: String, buckets: Int)(
      batch: DataFrame, epoch: Long): Unit = {
    val root = Paths.get(path)
    val marker = root.resolve("_epoch")
    val last =
      if (Files.exists(marker))
        new String(Files.readAllBytes(marker)).trim.toLong
      else -1L
    if (epoch <= last) return // replayed epoch: already committed
    batch.write.format("graft-kv").option("path", path)
      .option("keyCol", keyCol).option("buckets", buckets.toString)
      .mode("append").save()
    Files.createDirectories(root)
    val tmp = root.resolve("._epoch.tmp")
    Files.write(tmp, epoch.toString.getBytes)
    Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Start a streaming query that upserts `stream` into the graft-kv
    * table at `path` keyed by `keyCol`. */
  def run(stream: DataFrame, path: String, keyCol: String,
      checkpoint: String, buckets: Int = 8): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(handleBatch(path, keyCol, buckets) _)
      .start()
}
