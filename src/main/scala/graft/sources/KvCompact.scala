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
 *  - snapshot isolation with one-generation grace: GC retains the
 *    previous manifest generation AND every data file it references, so
 *    a reader that planned its scan against the pre-compaction manifest
 *    reads the identical snapshot while/after compaction runs; only
 *    strictly older generations are garbage. (At 100 TB this is the
 *    standard table-format retention window — readers are expected to
 *    finish within one maintenance cycle, and the window is one knob
 *    away from N generations if they don't.)
 *  - a concurrent/replayed append is safe: appends stack a new
 *    generation on whatever manifest they read, and compaction of gen G
 *    produces gen G+1 — the monotone-generation rule the streaming
 *    sink's `_epoch` guard already relies on (compaction never touches
 *    `_epoch`). Two writers racing to the SAME generation cannot lose
 *    an update silently: `KvStore.writeManifest` commits by hard-link,
 *    which fails on an existing target, so the loser gets an
 *    IllegalStateException and must re-read + retry.
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
      val segs = m.segments.filter(s => KvStore.bucketPart(s).startsWith(prefix))
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
    // The new manifest is live. GC with one-generation grace: the
    // previous manifest (gen m.gen) and every segment it references
    // survive so concurrent readers of that snapshot finish cleanly;
    // data files from generations < the new one that the previous
    // manifest does NOT reference are garbage from older cycles.
    // Files stamped with the new generation are never touched (they are
    // either ours or an in-flight append's staging-moved segments).
    val retained = m.segments.toSet
    val dataDir = root.resolve("data")
    Files.list(dataDir).iterator().asScala.toSeq.foreach { p =>
      val n = p.getFileName.toString
      if (segGen(n).exists(g => g < gen) && !retained.contains(n))
        Files.deleteIfExists(p)
    }
    gcManifests(root, keepFrom = m.gen)
    (before, committed.size)
  }

  /** Generation stamp of a committed segment name `g<gen>-...`, if the
    * name parses (staging/stray files don't — they are left alone). */
  private def segGen(name: String): Option[Long] = {
    val i = name.indexOf('-')
    if (i <= 1 || name.charAt(0) != 'g') None
    else try Some(name.substring(1, i).toLong) catch { case _: NumberFormatException => None }
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

  private def gcManifests(root: Path, keepFrom: Long): Unit = {
    val md = root.resolve("manifest")
    if (!Files.isDirectory(md)) return
    Files.list(md).iterator().asScala.toSeq.foreach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".json") && n.stripSuffix(".json").toLong < keepFrom)
        Files.deleteIfExists(p)
    }
  }
}
