package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/**
 * Compaction for the `graft-kv` table — the LSM maintenance half the
 * write path promises ("segment replay per bucket is bounded by
 * compaction"). Per bucket, all live segments are replayed in manifest
 * order with the SAME last-write-wins + arrival-order resolution the
 * reader uses, and rewritten as ONE segment; a new manifest generation
 * then lists only the compacted segments. After compaction every bucket
 * costs one file open per read instead of one per historical batch.
 *
 * Crash discipline (the KeyedSink/KvBatchWrite contract):
 *  - compacted segments are staged, then moved into `data/` under the
 *    NEW generation prefix — both invisible until the manifest renames;
 *  - the manifest rename is the commit point: a crash anywhere before it
 *    leaves the previous generation fully intact (old segments are only
 *    deleted AFTER the rename);
 *  - a concurrent/replayed append is safe: appends stack a new
 *    generation on whatever manifest they read, and compaction of gen G
 *    produces gen G+1 — the monotone-generation rule the streaming
 *    sink's `_epoch` guard already relies on (compaction never touches
 *    `_epoch`).
 *
 * At 100 TB the per-bucket loop is an embarrassingly parallel job (one
 * task per bucket — the same partitioning the reader plans); on this
 * local-FS table the driver loop IS that job at 1 task.
 */
object KvCompact {

  /** Test hook: set to fail between data-file moves and the manifest
    * rename (crash-recovery spec). Cleared after firing. */
  @volatile private[sources] var crashBeforeManifest: Boolean = false

  /** Compact the table at `dir` to one segment per nonempty bucket.
    * Returns (segmentsBefore, segmentsAfter); no-op on an empty table. */
  def compact(dir: String): (Int, Int) = {
    val root = Paths.get(dir)
    val m = KvStore.readManifest(root).getOrElse(return (0, 0))
    val before = m.segments.size
    val gen = m.gen + 1
    val staging = root.resolve("staging")
    Files.createDirectories(staging)
    Files.createDirectories(root.resolve("data"))
    val keyIdx = org.apache.spark.sql.types.StructType
      .fromDDL(m.schemaDdl).fieldIndex(m.keyCol)
    val committed = (0 until m.buckets).flatMap { b =>
      val prefix = f"b$b%04d-"
      val segs = m.segments.filter(_.substring(8).startsWith(prefix))
      if (segs.isEmpty) None
      else {
        // the reader's resolution, verbatim: manifest order, last write
        // wins, first-arrival key order preserved
        val state = mutable.LinkedHashMap.empty[String, String]
        segs.foreach { seg =>
          val ls = Files.lines(root.resolve("data").resolve(seg), UTF_8)
          try ls.iterator().asScala.foreach { line =>
            state.put(line.split("\t", -1)(keyIdx), line)
          } finally ls.close()
        }
        val name = f"b$b%04d-compact.seg"
        val tmp = staging.resolve(name)
        val w = Files.newBufferedWriter(tmp, UTF_8)
        try state.valuesIterator.foreach { l => w.write(l); w.write('\n') }
        finally w.close()
        val target = f"g$gen%06d-$name"
        Files.move(tmp, root.resolve("data").resolve(target),
          StandardCopyOption.ATOMIC_MOVE)
        Some(target)
      }
    }
    if (crashBeforeManifest) {
      crashBeforeManifest = false
      throw new RuntimeException(
        "graft-kv compact: injected crash before manifest commit")
    }
    KvStore.writeManifest(root, KvStore.Manifest(gen, m.schemaDdl,
      m.keyCol, m.buckets, committed))
    // the new manifest is live — previous-generation data files and old
    // manifest jsons are now garbage
    m.segments.foreach { seg =>
      Files.deleteIfExists(root.resolve("data").resolve(seg))
    }
    gcManifests(root, keep = gen)
    (before, committed.size)
  }

  /** LSM policy hook: compact only when the live segment count exceeds
    * `maxSegments` — the knob a streaming ingest calls after each epoch. */
  def maybeCompact(dir: String, maxSegments: Int): Boolean = {
    val root = Paths.get(dir)
    KvStore.readManifest(root) match {
      case Some(m) if m.segments.size > maxSegments => compact(dir); true
      case _ => false
    }
  }

  private def gcManifests(root: Path, keep: Long): Unit = {
    val md = root.resolve("manifest")
    if (!Files.isDirectory(md)) return
    Files.list(md).iterator().asScala.toSeq.foreach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".json") && n.stripSuffix(".json").toLong < keep)
        Files.deleteIfExists(p)
    }
  }
}
