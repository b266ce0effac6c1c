package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Laws for the streaming → graft-kv path: micro-batches become atomic KV
  * generations, keyed upserts converge, replayed epochs are no-ops, and
  * crash orphans stay invisible — the KeyedSink contract carried by the
  * V2 connector. */
class KvStreamSinkSpec extends SparkSpec {

  import spark.implicits._

  private def state(path: String): Map[String, Long] =
    spark.read.format("graft-kv").load(path).collect()
      .map(r => r.getAs[String]("data_key") -> r.getAs[Long]("v")).toMap

  test("end-to-end MemoryStream: upserts converge to last value per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val path = tmpDir("kvstream")
    val q = KvStreamSink.run(input.toDF().toDF("data_key", "v"), path,
      "data_key", tmpDir("kvstream-ckpt"), buckets = 4)
    try {
      input.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      assert(state(path) === Map("a" -> 1L, "b" -> 2L))
      input.addData(("b", 20L), ("c", 3L))
      q.processAllAvailable()
      assert(state(path) === Map("a" -> 1L, "b" -> 20L, "c" -> 3L))
    } finally q.stop()
  }

  test("replayed epoch is a no-op (high-water marker)") {
    val path = tmpDir("kvreplay")
    val handler = KvStreamSink.handleBatch(path, "data_key", 2) _
    handler(Seq(("k", 1L)).toDF("data_key", "v"), 0L)
    handler(Seq(("k", 2L)).toDF("data_key", "v"), 1L)
    assert(state(path) === Map("k" -> 2L))
    val genBefore = graft.sources.KvStore.readManifest(Paths.get(path)).get.gen
    // replay epoch 1 with DIFFERENT (stale) data: must be ignored
    handler(Seq(("k", 999L)).toDF("data_key", "v"), 1L)
    assert(state(path) === Map("k" -> 2L))
    assert(graft.sources.KvStore.readManifest(Paths.get(path)).get.gen === genBefore)
  }

  test("crash between commit and marker: re-run converges by value") {
    val path = tmpDir("kvcrash")
    val handler = KvStreamSink.handleBatch(path, "data_key", 2) _
    handler(Seq(("k", 5L)).toDF("data_key", "v"), 0L)
    // simulate crash-before-marker: roll the marker back
    Files.write(Paths.get(path, "_epoch"), "-1".getBytes)
    handler(Seq(("k", 5L)).toDF("data_key", "v"), 0L) // recovery replay
    assert(state(path) === Map("k" -> 5L))
    // two generations exist (re-append), but the state converged
    assert(graft.sources.KvStore.readManifest(Paths.get(path)).get.gen === 2L)
  }

  test("streaming curation composes: derived columns land keyed and deduped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val path = tmpDir("kvcurate")
    val derived = input.toDF().toDF("id", "text")
      .select(concat(lit("doc-"), col("id")).as("data_key"),
        size(split(col("text"), " ")).cast("long").as("v"))
    val q = KvStreamSink.run(derived, path, "data_key",
      tmpDir("kvcurate-ckpt"), buckets = 2)
    try {
      input.addData((1L, "a b c"), (2L, "x y"))
      q.processAllAvailable()
      input.addData((1L, "a b c d e")) // re-ingest doc 1, longer now
      q.processAllAvailable()
      assert(state(path) === Map("doc-1" -> 5L, "doc-2" -> 2L))
    } finally q.stop()
  }

  test("compactOver policy: segments stay bounded under continuous ingest; state unchanged") {
    val path = tmpDir("kvcompactstream")
    def segs: Int = graft.sources.KvStore
      .readManifest(java.nio.file.Paths.get(path)).map(_.segments.size)
      .getOrElse(0)
    val handler = KvStreamSink.handleBatch(path, "data_key", 2,
      compactOver = 3) _
    (0 until 8).foreach { e =>
      handler(Seq((s"k${e % 3}", e.toLong), ("hot", e.toLong * 10))
        .toDF("data_key", "v"), e.toLong)
      assert(segs <= 3 + 2,
        s"epoch $e left $segs live segments (cap 3 + <=2-bucket burst)")
    }
    // state equals the full recompute over everything ingested
    assert(state(path) === Map("k0" -> 6L, "k1" -> 7L, "k2" -> 5L,
      "hot" -> 70L))
    // replay of an old epoch after compaction is still a no-op
    handler(Seq(("hot", 999L)).toDF("data_key", "v"), 2L)
    assert(state(path)("hot") === 70L)
  }
}
