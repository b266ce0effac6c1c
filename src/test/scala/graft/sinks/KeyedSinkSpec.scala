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
}
