package graft.streaming

import graft.SparkSpec
import graft.sinks.KeyedParquetSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming incremental-CC laws: after ANY prefix of micro-batches the
  * stored labels equal a one-shot batch CC over the union of every edge
  * ingested so far (path-independence of the canonical min-label
  * fixpoint — the q446 argument, here across epochs); a replayed epoch
  * is a no-op; merges across batch boundaries (an edge bridging two
  * components stored by EARLIER batches) relabel every member of both. */
class StreamingCcSpec extends SparkSpec {

  private def stateOf(sink: KeyedParquetSink): Map[Long, Long] =
    sink.read(spark).get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def oneShot(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    graft.graph.Graph.hookComponents(edges.toDF("x", "y"), "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("N batch merges equal the one-shot CC after every prefix; replay is a no-op") {
    val s = spark
    import s.implicits._
    val sink = new KeyedParquetSink(tmpDir("stream-cc"), "id")
    val handler = StreamingCc.mergeBatch(sink) _

    // b1: two separate chains {1-2-3} and {10-11}
    val b1 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    handler(b1.toDF("x", "y"), 0L)
    assert(stateOf(sink) === oneShot(b1))

    // b2: new component {20,21} + growth of an old one (3-4)
    val b2 = Seq((20L, 21L), (3L, 4L))
    handler(b2.toDF("x", "y"), 1L)
    assert(stateOf(sink) === oneShot(b1 ++ b2))

    // b3: a single edge BRIDGING two components stored by earlier
    // batches — every member of {10,11} must relabel to min 1
    val b3 = Seq((11L, 21L), (21L, 1L))
    handler(b3.toDF("x", "y"), 2L)
    val st = stateOf(sink)
    assert(st === oneShot(b1 ++ b2 ++ b3))
    assert(Seq(10L, 11L, 20L, 21L).forall(st(_) == 1L),
      "cross-batch bridge must relabel all members of both old components")

    // replayed epoch: the sink's high-water guard rejects it
    handler(b3.toDF("x", "y"), 2L)
    assert(stateOf(sink) === oneShot(b1 ++ b2 ++ b3))
  }

  test("untouched components are not rewritten: the merge result is scoped to the blast radius") {
    val s = spark
    import s.implicits._
    val sink = new KeyedParquetSink(tmpDir("stream-cc-scope"), "id")
    val handler = StreamingCc.mergeBatch(sink) _
    handler(Seq((1L, 2L), (50L, 51L)).toDF("x", "y"), 0L)
    // delta touching only {50,51}: the returned merge frame must not
    // contain node 1/2 rows (the upsert writes only touched buckets)
    val merged = graft.graph.Graph.incrementalMerge(
      sink.read(spark).get, Seq((51L, 52L)).toDF("x", "y"))
    val ids = merged.collect().map(_.getLong(0)).toSet
    assert(ids === Set(50L, 51L, 52L),
      s"merge scope must be the touched component + new nodes, got $ids")
  }

  test("crash-recovery e2e: query killed between sink write and manifest " +
      "commit, restarted from the same checkpoint, labels equal one-shot CC") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Long)]
    val sinkPath = tmpDir("stream-cc-crash")
    val ckpt = tmpDir("stream-cc-crash-ckpt")
    val sink = new KeyedParquetSink(sinkPath, "id")
    def startQuery() = input.toDF().toDF("x", "y").writeStream
      .queryName("graft-cc-crash-recovery")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingCc.mergeBatch(sink) _)
      .start()

    // epoch 0 commits normally: two components {1,2,3} and {10,11}
    val b0 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val q1 = startQuery()
    try { input.addData(b0: _*); q1.processAllAvailable() } finally q1.stop()
    assert(stateOf(sink) === oneShot(b0))

    // epoch 1 "crashes" in the widest window: staged bucket data renamed
    // into the tree, manifest NOT committed — exactly what a process kill
    // at that instant leaves on disk. The batch BRIDGES the two stored
    // components, the hardest case to recover (relabels span old state).
    val b1 = Seq((3L, 10L), (20L, 21L))
    sink.beforeCommitHook = () => throw new RuntimeException("injected kill")
    val q2 = startQuery()
    input.addData(b1: _*)
    intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    assert(stateOf(sink) === oneShot(b0),
      "uncommitted crash must leave exactly the pre-crash committed labels")

    // restart from the SAME checkpoint: Spark replays the failed batch,
    // the handler re-merges against the (old) committed labels, commits
    sink.beforeCommitHook = () => ()
    val q3 = startQuery()
    try q3.processAllAvailable() finally q3.stop()
    val st = stateOf(sink)
    assert(st === oneShot(b0 ++ b1),
      "post-recovery labels must equal the one-shot batch CC over all edges")
    assert(Seq(1L, 2L, 3L, 10L, 11L).forall(st(_) == 1L),
      "the replayed bridge must have merged both pre-crash components")
  }

  test("end-to-end over MemoryStream: labels match the batch CC") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Long)]
    val sinkPath = tmpDir("stream-cc-e2e")
    val q = StreamingCc.run(input.toDF().toDF("x", "y"), "x", "y",
      sinkPath, tmpDir("stream-cc-ckpt"))
    try {
      input.addData((1L, 2L), (5L, 6L))
      q.processAllAvailable()
      input.addData((2L, 5L)) // bridge across the first batch's components
      q.processAllAvailable()
    } finally q.stop()
    assert(stateOf(new KeyedParquetSink(sinkPath, "id")) ===
      oneShot(Seq((1L, 2L), (5L, 6L), (2L, 5L))))
  }
}
