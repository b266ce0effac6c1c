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

  /** The per-batch handler (public for direct spec-level law testing).
    * `compactOver`: after the epoch commits, run [[graft.sources.KvCompact]]
    * when the live segment count exceeds it — the LSM policy that keeps
    * per-bucket read amplification bounded FOREVER under continuous
    * ingest (compaction happens after the `_epoch` bump, so a crash
    * mid-compaction is invisible: the epoch is already durable and
    * compaction itself is manifest-atomic). 0 disables. */
  def handleBatch(path: String, keyCol: String, buckets: Int,
      compactOver: Int = 0)(batch: DataFrame, epoch: Long): Unit = {
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
    if (compactOver > 0)
      graft.sources.KvCompact.maybeCompact(path, compactOver)
  }

  /** Start a streaming query that upserts `stream` into the graft-kv
    * table at `path` keyed by `keyCol`, compacting whenever the live
    * segment count exceeds `compactOver` (0 = never). */
  def run(stream: DataFrame, path: String, keyCol: String,
      checkpoint: String, buckets: Int = 8,
      compactOver: Int = 0): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(handleBatch(path, keyCol, buckets, compactOver) _)
      .start()
}
