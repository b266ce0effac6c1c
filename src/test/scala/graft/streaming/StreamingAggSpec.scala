package graft.streaming

import graft.{SparkSpec, Tables}
import graft.sinks.KeyedParquetSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental maintenance laws: stored state equals the full
  * recompute after every batch; only touched keys rewrite; a replayed
  * epoch cannot double-count. */
class StreamingAggSpec extends SparkSpec {

  private def stateOf(sink: KeyedParquetSink): Map[Long, (Long, Long)] =
    sink.read(spark).get.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("batch-wise merge equals full recompute; replayed epoch is a no-op") {
    val s = spark
    import s.implicits._
    val sink = new KeyedParquetSink(tmpDir("stream-agg"), "user_id")
    val handler = StreamingAgg.mergeBatch(sink, "user_id", "cents") _

    val b1 = Seq((1L, 100L), (1L, 50L), (2L, 10L)).toDF("user_id", "cents")
    handler(b1, 0L)
    assert(stateOf(sink) === Map(1L -> ((2L, 150L)), 2L -> ((1L, 10L))))

    val b2 = Seq((1L, 1L), (3L, 7L)).toDF("user_id", "cents")
    handler(b2, 1L)
    assert(stateOf(sink) === Map(
      1L -> ((3L, 151L)), 2L -> ((1L, 10L)), 3L -> ((1L, 7L))))

    // replay of a committed epoch: the sink's high-water guard rejects the
    // (re-merged, double-counted) upsert — state unchanged
    handler(b2, 1L)
    assert(stateOf(sink) === Map(
      1L -> ((3L, 151L)), 2L -> ((1L, 10L)), 3L -> ((1L, 7L))))
  }

  test("end-to-end over MemoryStream: state equals the batch group-by") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Long)]
    val sinkPath = tmpDir("stream-agg-e2e")
    val q = StreamingAgg.runCountSum(
      input.toDF().toDF("user_id", "cents"), "user_id", "cents",
      sinkPath, tmpDir("stream-agg-ckpt"))
    try {
      input.addData((1L, 5L), (2L, 6L))
      q.processAllAvailable()
      input.addData((1L, 7L))
      q.processAllAvailable()
    } finally q.stop()
    val sink = new KeyedParquetSink(sinkPath, "user_id")
    assert(stateOf(sink) === Map(1L -> ((2L, 12L)), 2L -> ((1L, 6L))))
  }

  test("NULL keys merge (null-safe semi-join), string keys + double values keep their types") {
    val s = spark
    import s.implicits._
    // string key + fractional value: the empty first-batch state must take
    // THIS schema (derived from the delta), not a hardcoded (Long,Long,Long)
    val sink = new KeyedParquetSink(tmpDir("stream-agg-nullkey"), "k")
    val handler = StreamingAgg.mergeBatch(sink, "k", "x") _
    val b1 = Seq((Some("a"), 1.5), (None, 2.0), (None, 3.0))
      .map { case (k, v) => (k.orNull, v) }.toDF("k", "x")
    handler(b1, 0L)
    def state(): Map[Option[String], (Long, Double)] =
      sink.read(spark).get.collect()
        .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(state() === Map(Some("a") -> ((1L, 1.5)), None -> ((2L, 5.0))))
    // second batch touches the NULL key again: plain-equality semi-join
    // would drop the prior NULL-key state and overwrite (1, 4.0); the
    // null-safe join must MERGE to (3, 9.0)
    val b2 = Seq((null.asInstanceOf[String], 4.0)).toDF("k", "x")
    handler(b2, 1L)
    assert(state() === Map(Some("a") -> ((1L, 1.5)), None -> ((3L, 9.0))))
  }

  test("crash-recovery e2e: query killed between sink write and manifest commit, " +
      "restarted from checkpoint, state equals full recompute") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Long)]
    val sinkPath = tmpDir("stream-agg-crash")
    val ckpt = tmpDir("stream-agg-crash-ckpt")
    val sink = new KeyedParquetSink(sinkPath, "user_id")
    def startQuery() = input.toDF().toDF("user_id", "cents").writeStream
      .queryName("graft-crash-recovery")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingAgg.mergeBatch(sink, "user_id", "cents") _)
      .start()

    // epoch 0 commits normally
    val q1 = startQuery()
    try {
      input.addData((1L, 100L), (2L, 10L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(stateOf(sink) === Map(1L -> ((1L, 100L)), 2L -> ((1L, 10L))))

    // epoch 1 "crashes" in the widest window: staged data renamed into the
    // bucket tree, manifest NOT committed — the query dies exactly as a
    // process kill at that instant would leave the disk
    sink.beforeCommitHook = () => throw new RuntimeException("injected kill")
    val q2 = startQuery()
    input.addData((1L, 1L), (3L, 7L))
    intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    // committed state is still exactly epoch 0's
    assert(stateOf(sink) === Map(1L -> ((1L, 100L)), 2L -> ((1L, 10L))))

    // restart from the SAME checkpoint: Spark replays the failed batch, the
    // handler re-reads the (old) committed state, and the re-merge commits
    sink.beforeCommitHook = () => ()
    val q3 = startQuery()
    try q3.processAllAvailable() finally q3.stop()
    assert(stateOf(sink) === Map(
      1L -> ((2L, 101L)), 2L -> ((1L, 10L)), 3L -> ((1L, 7L))),
      "post-recovery state must equal the full recompute over all ingested data")
  }

  test("real-data law: replaying the events table in 4 chunks equals one group-by") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("user_id"), col("cents"))
    val sink = new KeyedParquetSink(tmpDir("stream-agg-real"), "user_id")
    val handler = StreamingAgg.mergeBatch(sink, "user_id", "cents") _
    (0 until 4).foreach { i =>
      handler(ev.filter(pmod(col("user_id"), lit(4)) === i), i.toLong)
    }
    val full = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stateOf(sink) === full)
  }
}
