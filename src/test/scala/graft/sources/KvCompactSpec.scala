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

  test("GC keeps exactly one prior generation: grace now, garbage next cycle") {
    val dir = tmpDir("kvc2")
    write(Seq(("a", 1L), ("b", 2L)).toDF("data_key", "v"), dir)
    write(Seq(("a", 10L)).toDF("data_key", "v"), dir)
    val gen2Segs = liveSegments(dir)
    KvCompact.compact(dir)
    val root = Paths.get(dir)
    // one-generation grace: every segment the previous manifest references
    // survives this compaction (a reader of that snapshot can finish)
    gen2Segs.foreach { s =>
      assert(Files.exists(root.resolve("data").resolve(s)),
        s"grace-window segment $s was deleted under a live snapshot")
    }
    def manifests() = Files.list(root.resolve("manifest")).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json")).toSeq.sorted
    assert(manifests().size === 2, s"expected live + grace manifests: ${manifests()}")
    // next cycle: those same segments leave the grace window and are GC'd
    write(Seq(("b", 22L)).toDF("data_key", "v"), dir)
    KvCompact.compact(dir)
    gen2Segs.foreach { s =>
      assert(!Files.exists(root.resolve("data").resolve(s)),
        s"out-of-window segment $s not GC'd")
    }
    assert(manifests().size === 2, s"manifest GC should keep 2: ${manifests()}")
    assert(read(dir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("a" -> 10L, "b" -> 22L))
  }

  test("snapshot isolation: a reader holding the pre-compaction manifest " +
      "reads the identical snapshot after compaction commits") {
    val dir = tmpDir("kvc7")
    write(Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("data_key", "v"), dir)
    write(Seq(("b", 20L), ("d", 40L)).toDF("data_key", "v"), dir)
    val root = Paths.get(dir)
    val pinned = KvStore.readManifest(root).get // the reader's planned snapshot
    val before = read(dir).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    KvCompact.compact(dir) // maintenance runs while the reader is mid-scan
    // every segment the pinned manifest references must still exist...
    pinned.segments.foreach { s =>
      assert(Files.exists(root.resolve("data").resolve(s)),
        s"segment $s of the pinned snapshot deleted by compaction")
    }
    // ...and a scan planned against the pinned manifest yields the
    // identical rows (this is exactly what BatchScanExec would execute)
    val scan = new KvScan(dir, pinned, org.apache.spark.sql.types.StructType
      .fromDDL(pinned.schemaDdl))
    val rf = scan.createReaderFactory()
    val got = scan.planInputPartitions().toSeq.flatMap { p =>
      val r = rf.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (r.next()) {
        val row = r.get()
        buf += ((row.getUTF8String(0).toString, row.getLong(1)))
      }
      r.close(); buf
    }
    assert(got === before)
  }

  test("bucket membership survives a generation stamp wider than %06d") {
    val dir = tmpDir("kvc8")
    write(Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("data_key", "v"), dir)
    val root = Paths.get(dir)
    val m = KvStore.readManifest(root).get
    // simulate a long-lived table: restamp every live segment at a
    // 7-digit generation and commit a manifest at that generation
    val wideGen = 1000000L + m.gen
    val renamed = m.segments.map { s =>
      val target = f"g$wideGen%d-${KvStore.bucketPart(s)}"
      Files.move(root.resolve("data").resolve(s), root.resolve("data").resolve(target))
      target
    }
    KvStore.writeManifest(root, m.copy(gen = wideGen, segments = renamed))
    // read still resolves every bucket (the r9 bug dropped ALL segments here)
    assert(read(dir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
    // and compaction still sees them too
    val (b, a) = KvCompact.compact(dir)
    assert(b === renamed.size && a >= 1)
    assert(read(dir).count() === 3L)
  }

  test("manifest commit is first-writer-wins: a racing same-generation " +
      "commit fails loudly instead of silently replacing") {
    val dir = tmpDir("kvc9")
    write(Seq(("a", 1L)).toDF("data_key", "v"), dir)
    val root = Paths.get(dir)
    val m = KvStore.readManifest(root).get
    // two writers that both read gen m.gen race to commit m.gen+1
    KvStore.writeManifest(root, m.copy(gen = m.gen + 1))
    val e = intercept[IllegalStateException] {
      KvStore.writeManifest(root, m.copy(gen = m.gen + 1, segments = Seq.empty))
    }
    assert(e.getMessage.contains("already committed"))
    // the first commit's content is intact (segments not clobbered to empty)
    assert(KvStore.readManifest(root).get.segments === m.segments)
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
