package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for graft-kv compaction: read equivalence (content AND per-bucket
  * arrival order), segment-count collapse, crash-before-manifest safety,
  * garbage collection, idempotence, interleaving with appends, and the
  * maybeCompact LSM policy gate. */
class KvCompactSpec extends SparkSpec {

  import spark.implicits._

  private def write(df: org.apache.spark.sql.DataFrame, dir: String,
      mode: String = "append"): Unit =
    df.write.format("graft-kv").option("path", dir).mode(mode).save()

  private def read(dir: String) =
    spark.read.format("graft-kv").load(dir)

  private def liveSegments(dir: String): Seq[String] =
    KvStore.readManifest(Paths.get(dir)).map(_.segments).getOrElse(Seq.empty)

  test("compaction preserves the read exactly and collapses segments") {
    val dir = tmpDir("kvc1")
    write(Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("data_key", "v"), dir)
    write(Seq(("b", 20L), ("d", 40L)).toDF("data_key", "v"), dir)
    write(Seq(("a", 100L), ("e", 50L)).toDF("data_key", "v"), dir)
    val before = read(dir).collect().map(r => (r.getString(0), r.getLong(1)))
    val nSegBefore = liveSegments(dir).size
    assert(nSegBefore > 3, s"expected multiple generations, got $nSegBefore")
    val (b, a) = KvCompact.compact(dir)
    assert(b === nSegBefore)
    val after = read(dir).collect().map(r => (r.getString(0), r.getLong(1)))
    // content AND order: the compactor replays the reader's LinkedHashMap
    // resolution, so even row order per bucket is identical
    assert(after.toSeq === before.toSeq)
    assert(liveSegments(dir).size === a)
    assert(a <= KvStore.readManifest(Paths.get(dir)).get.buckets)
  }

  test("old data files and manifests are garbage-collected after commit") {
    val dir = tmpDir("kvc2")
    write(Seq(("a", 1L), ("b", 2L)).toDF("data_key", "v"), dir)
    write(Seq(("a", 10L)).toDF("data_key", "v"), dir)
    val oldSegs = liveSegments(dir)
    KvCompact.compact(dir)
    val root = Paths.get(dir)
    oldSegs.foreach { s =>
      assert(!Files.exists(root.resolve("data").resolve(s)),
        s"old segment $s not GC'd")
    }
    val manifests = Files.list(root.resolve("manifest")).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json")).toSeq
    assert(manifests.size === 1, s"expected only the live manifest: $manifests")
  }

  test("crash before manifest commit leaves the previous generation intact") {
    val dir = tmpDir("kvc3")
    write(Seq(("a", 1L), ("b", 2L)).toDF("data_key", "v"), dir)
    write(Seq(("b", 20L), ("c", 30L)).toDF("data_key", "v"), dir)
    val before = read(dir).collect().map(r => (r.getString(0), r.getLong(1)))
    val segsBefore = liveSegments(dir)
    KvCompact.crashBeforeManifest = true
    intercept[RuntimeException] { KvCompact.compact(dir) }
    // the reader sees the OLD manifest: same segments, same data
    assert(liveSegments(dir) === segsBefore)
    val after = read(dir).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(after.toSeq === before.toSeq)
    // recovery: rerunning compaction succeeds and converges
    val (_, a) = KvCompact.compact(dir)
    assert(a >= 1)
    assert(read(dir).collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq === before.toSeq)
  }

  test("appends after compaction stack a new generation; double compact is stable") {
    val dir = tmpDir("kvc4")
    write(Seq(("a", 1L), ("b", 2L)).toDF("data_key", "v"), dir)
    KvCompact.compact(dir)
    write(Seq(("a", 99L), ("z", 9L)).toDF("data_key", "v"), dir)
    val m = read(dir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("a" -> 99L, "b" -> 2L, "z" -> 9L))
    KvCompact.compact(dir)
    KvCompact.compact(dir) // idempotent on an already-compact table
    val m2 = read(dir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m2 === m)
  }

  test("maybeCompact fires only above the segment threshold") {
    val dir = tmpDir("kvc5")
    write(Seq(("a", 1L)).toDF("data_key", "v"), dir)
    val n1 = liveSegments(dir).size
    assert(!KvCompact.maybeCompact(dir, maxSegments = n1))
    write(Seq(("b", 2L)).toDF("data_key", "v"), dir)
    write(Seq(("c", 3L)).toDF("data_key", "v"), dir)
    assert(KvCompact.maybeCompact(dir, maxSegments = n1))
    assert(read(dir).count() === 3L)
  }

  test("column pruning still planned against the compacted table") {
    val dir = tmpDir("kvc6")
    write(Seq(("a", 1L, "x"), ("b", 2L, "y")).toDF("data_key", "v", "s"), dir)
    write(Seq(("a", 10L, "xx")).toDF("data_key", "v", "s"), dir)
    KvCompact.compact(dir)
    val df = read(dir).select(col("v"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 10L))
    assert(df.queryExecution.executedPlan.toString.contains("cols=v"))
  }
}
