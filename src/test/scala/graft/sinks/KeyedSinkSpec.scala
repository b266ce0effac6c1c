package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The keyed sink's core contracts (SURVEY.md §2.9 T6; ADVICE round 1):
  * replay idempotency, multi-epoch last-write-wins upsert, deterministic
  * intra-batch dedup, and crash-atomic commit (old state survives an
  * uncommitted staging attempt).
  */
class KeyedSinkSpec extends SparkSpec {

  private def df(rows: (String, Int)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("data_key", "v")
  }

  private def state(sink: KeyedParquetSink): Map[String, Int] =
    sink.read(spark).map(_.collect().map(r =>
      r.getAs[String]("data_key") -> r.getAs[Int]("v")).toMap).getOrElse(Map.empty)

  test("replay of the same epoch is a no-op (exactly-once effect)") {
    val sink = new KeyedParquetSink(tmpDir("ks-replay"), "data_key", numBuckets = 8)
    val batch = df("a" -> 1, "b" -> 2)
    sink.upsert(batch, epochId = 0)
    val first = state(sink)
    sink.upsert(batch, epochId = 0) // replay: manifest for epoch 0 exists
    assert(state(sink) === first)
    assert(first === Map("a" -> 1, "b" -> 2))
  }

  test("writing the same batch under a new epoch leaves identical state (idempotency law)") {
    val sink = new KeyedParquetSink(tmpDir("ks-idem"), "data_key", numBuckets = 8)
    val batch = df("a" -> 1, "b" -> 2, "c" -> 3)
    sink.upsert(batch, epochId = 0)
    sink.upsert(batch, epochId = 1)
    assert(state(sink) === Map("a" -> 1, "b" -> 2, "c" -> 3))
  }

  test("multi-epoch upsert: incoming rows win, untouched keys survive") {
    val sink = new KeyedParquetSink(tmpDir("ks-upsert"), "data_key", numBuckets = 8)
    sink.upsert(df("a" -> 1, "b" -> 2), epochId = 0)
    sink.upsert(df("b" -> 20, "c" -> 30), epochId = 1)
    assert(state(sink) === Map("a" -> 1, "b" -> 20, "c" -> 30))
  }

  test("intra-batch duplicate keys resolve to the LAST arrival, deterministically") {
    // single-partition input so monotonically_increasing_id is arrival order
    val s = spark
    import s.implicits._
    val batch = Seq("k" -> 1, "k" -> 2, "k" -> 3).toDF("data_key", "v").coalesce(1)
    (0 until 3).foreach { i =>
      val sink = new KeyedParquetSink(tmpDir(s"ks-dup$i"), "data_key", numBuckets = 4)
      sink.upsert(batch, epochId = 0)
      assert(state(sink) === Map("k" -> 3), s"trial $i")
    }
  }

  test("replay of an epoch older than the high-water mark is rejected even after manifest GC") {
    val sink = new KeyedParquetSink(tmpDir("ks-hwm"), "data_key", numBuckets = 1)
    sink.upsert(df("k" -> 0), epochId = 0)
    sink.upsert(df("k" -> 1), epochId = 1)
    sink.upsert(df("k" -> 2), epochId = 2) // manifest GC keeps only epochs 1,2
    sink.upsert(df("k" -> 99), epochId = 1) // replay of a surviving manifest: skip
    assert(state(sink) === Map("k" -> 2))
    // epoch 0's manifest file is GONE — the old exists()-guard would have
    // re-applied this and clobbered k=2 with incoming-wins (ADVICE r2);
    // a silent skip would instead drop new data forever after a checkpoint
    // rebuild, so the sink fails fast
    val boom = intercept[IllegalStateException] { sink.upsert(df("k" -> 99), epochId = 0) }
    assert(boom.getMessage.contains("high-water"))
    assert(state(sink) === Map("k" -> 2))
  }

  test("GC: superseded versions survive exactly one commit; orphans are collected") {
    val dir = tmpDir("ks-gc")
    val sink = new KeyedParquetSink(dir, "data_key", numBuckets = 1)
    def versionDirs: Set[String] = {
      val d = new java.io.File(s"$dir/buckets/__bucket=0")
      Option(d.list()).map(_.toSet).getOrElse(Set.empty)
    }
    sink.upsert(df("k" -> 0), epochId = 0)
    val Seq(v0) = versionDirs.toSeq
    sink.upsert(df("k" -> 1), epochId = 1)
    // retention window: the previous manifest's version is still readable
    assert(versionDirs.contains(v0), "superseded version deleted immediately")
    assert(versionDirs.size === 2)
    // an orphan from a crashed attempt, plus the next commit
    df("k" -> 42).coalesce(1).write.parquet(s"$dir/buckets/__bucket=0/v9_orphan")
    sink.upsert(df("k" -> 2), epochId = 2)
    assert(!versionDirs.contains(v0), "version beyond the retention window kept")
    assert(!versionDirs.contains("v9_orphan"), "crashed-attempt orphan not collected")
    assert(versionDirs.size === 2) // epochs 1 and 2
    assert(state(sink) === Map("k" -> 2))
  }

  test("readAt: time travel inside the retention window, None outside it") {
    val sink = new KeyedParquetSink(tmpDir("ks-tt"), "data_key", numBuckets = 4)
    sink.upsert(df("a" -> 1), epochId = 0)
    sink.upsert(df("a" -> 2, "b" -> 9), epochId = 1)
    assert(sink.readableEpochs(spark) === Seq(0L, 1L))
    // previous commit's state is fully readable (retention GC guarantees
    // its version dirs survive)
    val at0 = sink.readAt(spark, 0L).get.collect()
      .map(r => r.getAs[String]("data_key") -> r.getAs[Int]("v")).toMap
    assert(at0 === Map("a" -> 1))
    assert(state(sink) === Map("a" -> 2, "b" -> 9))
    // a third commit rolls epoch 0 out of the window
    sink.upsert(df("c" -> 3), epochId = 2)
    assert(sink.readableEpochs(spark) === Seq(1L, 2L))
    assert(sink.readAt(spark, 0L).isEmpty)
    val at1 = sink.readAt(spark, 1L).get.collect()
      .map(r => r.getAs[String]("data_key") -> r.getAs[Int]("v")).toMap
    assert(at1 === Map("a" -> 2, "b" -> 9))
  }

  test("crash before manifest commit leaves prior state intact (orphaned staging ignored)") {
    val dir = tmpDir("ks-crash")
    val sink = new KeyedParquetSink(dir, "data_key", numBuckets = 8)
    sink.upsert(df("a" -> 1), epochId = 0)
    // simulate a crashed epoch-1 attempt: data staged but no manifest written
    df("a" -> 99).write.mode("overwrite")
      .parquet(s"$dir/buckets/__bucket=0/v1_deadbeef")
    assert(state(sink) === Map("a" -> 1))
    // and a subsequent committed epoch proceeds normally
    sink.upsert(df("b" -> 2), epochId = 2)
    assert(state(sink) === Map("a" -> 1, "b" -> 2))
  }

  test("fault injection: crash BETWEEN data staging and manifest commit, then replay recovers") {
    val dir = tmpDir("ks-faultpoint")
    val sink = new KeyedParquetSink(dir, "data_key", numBuckets = 8)
    sink.upsert(df("a" -> 1, "b" -> 2), epochId = 0)
    // the widest crash window: version dirs already renamed into the bucket
    // tree (NOT just a leftover _staging dir), manifest not yet written
    sink.beforeCommitHook = () => throw new RuntimeException("injected crash")
    val batch = df("a" -> 10, "c" -> 3)
    intercept[RuntimeException] { sink.upsert(batch, epochId = 1) }
    // old state fully intact — the orphaned version dirs are invisible
    assert(state(sink) === Map("a" -> 1, "b" -> 2))
    // restart: Spark replays the failed epoch; the replay re-merges against
    // the OLD state and commits — equal to a crash-free run of epoch 1
    sink.beforeCommitHook = () => ()
    sink.upsert(batch, epochId = 1)
    assert(state(sink) === Map("a" -> 10, "b" -> 2, "c" -> 3))
    // the crashed attempt's orphan version dirs are GC'd once their buckets
    // commit again (retention keeps only manifest-referenced versions)
    sink.upsert(df("a" -> 11, "c" -> 4), epochId = 2)
    sink.upsert(df("a" -> 12, "c" -> 5), epochId = 3)
    assert(state(sink) === Map("a" -> 12, "b" -> 2, "c" -> 5))
  }
}
