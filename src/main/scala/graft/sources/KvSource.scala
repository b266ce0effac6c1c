package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 batch WRITE path `graft-kv`: a bucketed keyed-upsert table
 * on local storage — the connector-API twin of the engine's foreachBatch
 * keyed sink ([[graft.sinks.KeyedSink]], the es-hadoop `es.mapping.id`
 * analog; reference sink at bexley_spark_stream_msk_es.py:508-517). Where
 * `graft-synth` exercises the V2 READ surface (pruning + pushdown), this
 * exercises the V2 WRITE surface end-to-end: WriteBuilder → BatchWrite →
 * DataWriterFactory → per-task DataWriter with commit messages, driver-side
 * atomic commit, task abort, and `SupportsTruncate` for overwrite mode.
 *
 *   df.write.format("graft-kv").option("path", dir)
 *     .option("keyCol", "data_key").mode("append").save()
 *   spark.read.format("graft-kv").load(dir)        // latest state per key
 *
 * Storage model (LSM-lite, crash-atomic):
 *  - every task hashes rows by key into `buckets` staged segment files;
 *  - commit moves staged segments into `data/` and atomically renames a
 *    new numbered manifest listing ALL live segments (append keeps the
 *    previous list, truncate starts fresh) — readers only ever see
 *    manifested segments, so a crash between data write and manifest
 *    rename leaves invisible orphans, exactly the KeyedSink discipline;
 *  - reads plan ONE partition PER BUCKET: each reader replays only its
 *    bucket's segments in (generation, file) order applying
 *    last-write-wins per key — upsert resolution without any shuffle,
 *    because the write already co-located keys (the bucketed-join story
 *    applied to storage).
 *
 * At 100 TB the same layout holds: buckets scale out (one reader/core),
 * segment replay per bucket is bounded by compaction (q232's planner),
 * and commit cost is manifest-sized, not data-sized.
 */
object KvStore {
  val Null = "\\N"

  def enc(s: String): String =
    java.net.URLEncoder.encode(s, UTF_8)
  def dec(s: String): String =
    java.net.URLDecoder.decode(s, UTF_8)

  def bucketOf(key: String, buckets: Int): Int =
    ((key.hashCode % buckets) + buckets) % buckets

  /** Strip the generation prefix (`g<gen>-`) from a committed segment
    * name, leaving the bucket-leading task-local part (`b%04d-...`).
    * Parsed after the first '-' rather than at a fixed offset so a
    * generation wider than %06d still resolves to its bucket. */
  def bucketPart(seg: String): String = seg.substring(seg.indexOf('-') + 1)

  /** Serialize one field (Spark internal representation) to text. */
  def fieldToText(row: InternalRow, i: Int, dt: DataType): String = {
    if (row.isNullAt(i)) return Null
    dt match {
      case StringType => enc(row.getUTF8String(i).toString)
      case LongType | TimestampType | TimestampNTZType => row.getLong(i).toString
      case IntegerType | DateType => row.getInt(i).toString
      case DoubleType =>
        java.lang.Long.toHexString(java.lang.Double.doubleToLongBits(row.getDouble(i)))
      case FloatType =>
        java.lang.Integer.toHexString(java.lang.Float.floatToIntBits(row.getFloat(i)))
      case BooleanType => if (row.getBoolean(i)) "1" else "0"
      case ShortType => row.getShort(i).toString
      case ByteType => row.getByte(i).toString
      case other =>
        throw new IllegalArgumentException(
          s"graft-kv supports flat atomic columns only; got $other")
    }
  }

  /** Parse one serialized field back to the internal representation. */
  def textToField(s: String, dt: DataType): Any = {
    if (s == Null) return null
    dt match {
      case StringType => UTF8String.fromString(dec(s))
      case LongType | TimestampType | TimestampNTZType => s.toLong
      case IntegerType | DateType => s.toInt
      case DoubleType =>
        java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(s, 16))
      case FloatType =>
        java.lang.Float.intBitsToFloat(java.lang.Integer.parseUnsignedInt(s, 16))
      case BooleanType => s == "1"
      case ShortType => s.toShort
      case ByteType => s.toByte
      case other =>
        throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  // ---- manifest ----

  case class Manifest(gen: Long, schemaDdl: String, keyCol: String,
      buckets: Int, segments: Seq[String])

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c => c.toString
    } + "\""

  def writeManifest(dir: Path, m: Manifest): Unit = {
    Files.createDirectories(dir.resolve("manifest"))
    val json =
      s"""{"gen": ${m.gen}, "schema": ${q(m.schemaDdl)}, "keyCol": ${q(m.keyCol)}, "buckets": ${m.buckets}, "segments": [${m.segments.map(q).mkString(", ")}]}"""
    val tmp = dir.resolve("manifest").resolve(f".${m.gen}%020d.tmp")
    Files.write(tmp, json.getBytes(UTF_8))
    // Commit via hard-link, which atomically FAILS if the target already
    // exists (POSIX rename would silently replace it): two writers racing
    // to the same generation surface as an error instead of a lost update.
    val target = dir.resolve("manifest").resolve(f"${m.gen}%020d.json")
    try Files.createLink(target, tmp)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"graft-kv: manifest generation ${m.gen} was already committed " +
            "by a concurrent writer; re-read the manifest and retry", e)
    }
    Files.deleteIfExists(tmp)
  }

  /** Latest committed manifest, if any (orphan tmp files ignored). */
  def readManifest(dir: Path): Option[Manifest] = {
    val md = dir.resolve("manifest")
    if (!Files.isDirectory(md)) return None
    val stream = Files.list(md)
    val names =
      try stream.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && !n.startsWith(".")).toSeq.sorted
      finally stream.close()
    if (names.isEmpty) return None
    val json = new String(Files.readAllBytes(md.resolve(names.last)), UTF_8)
    // minimal parser for our own writer's shape
    def str(k: String): String = {
      val m = ("\"" + k + "\": \"").r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalStateException(s"manifest missing $k"))
      val sb = new StringBuilder
      var i = m.end
      while (json.charAt(i) != '"') {
        if (json.charAt(i) == '\\') { i += 1; json.charAt(i) match {
          case 'n' => sb.append('\n'); case c => sb.append(c) } }
        else sb.append(json.charAt(i))
        i += 1
      }
      sb.toString
    }
    def num(k: String): Long =
      ("\"" + k + "\": (\\d+)").r.findFirstMatchIn(json).get.group(1).toLong
    val segs = "\"segments\": \\[([^\\]]*)\\]".r.findFirstMatchIn(json).get.group(1)
      .split(",").map(_.trim).filter(_.nonEmpty).map(s => s.substring(1, s.length - 1))
    Some(Manifest(num("gen"), str("schema"), str("keyCol"),
      num("buckets").toInt, segs.toSeq))
  }
}

class KvSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kv"
  override def supportsExternalMetadata(): Boolean = true

  private def path(options: CaseInsensitiveStringMap): Path = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-kv requires a path"))
    Paths.get(p)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvStore.readManifest(path(options)) match {
      case Some(m) => StructType.fromDDL(m.schemaDdl)
      case None => throw new IllegalArgumentException(
        s"graft-kv table at ${path(options)} does not exist yet; " +
          "first write creates it")
    }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] class KvTable(tschema: StructType,
    options: CaseInsensitiveStringMap) extends Table
    with SupportsRead with SupportsWrite {
  private val dir = Paths.get(options.get("path"))
  private val keyCol = Option(options.get("keyCol")).getOrElse("data_key")
  private val buckets = options.getInt("buckets", 8)

  override def name(): String = s"graft-kv ${dir.toString}"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val m = KvStore.readManifest(dir).getOrElse(
      throw new IllegalArgumentException(s"graft-kv: no committed state at $dir"))
    new KvScanBuilder(dir.toString, m)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val ws = info.schema()
    require(ws.fieldNames.contains(keyCol),
      s"graft-kv: key column '$keyCol' missing from ${ws.fieldNames.mkString(",")}")
    require(ws(keyCol).dataType == StringType,
      s"graft-kv: key column '$keyCol' must be STRING")
    KvStore.readManifest(dir).foreach { m =>
      require(m.schemaDdl == ws.toDDL,
        s"graft-kv: schema mismatch on append: table has [${m.schemaDdl}], " +
          s"write has [${ws.toDDL}]")
      require(m.buckets == buckets,
        s"graft-kv: bucket count mismatch: table has ${m.buckets}, write asked $buckets")
    }
    new KvWriteBuilder(dir.toString, ws, keyCol, buckets, info.queryId())
  }
}

// ---------- write path ----------

private[sources] class KvWriteBuilder(dir: String, schema: StructType,
    keyCol: String, buckets: Int, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new KvBatchWrite(dir, schema, keyCol, buckets, queryId, doTruncate)
  }
}

private[sources] case class KvCommitMessage(staged: Seq[String])
  extends WriterCommitMessage

private[sources] class KvBatchWrite(dir: String, schema: StructType,
    keyCol: String, buckets: Int, queryId: String, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory(dir, schema.toDDL, keyCol, buckets, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = Paths.get(dir)
    Files.createDirectories(root.resolve("data"))
    val prev = KvStore.readManifest(root)
    val gen = prev.map(_.gen + 1).getOrElse(1L)
    // deterministic segment order within the batch: sort staged names
    val staged = messages.collect { case KvCommitMessage(s) => s }
      .flatten.sorted
    val committed = staged.map { name =>
      val target = f"g$gen%06d-$name"
      Files.move(root.resolve("staging").resolve(name),
        root.resolve("data").resolve(target),
        StandardCopyOption.ATOMIC_MOVE)
      target
    }
    val base = if (truncate) Seq.empty else prev.map(_.segments).getOrElse(Seq.empty)
    KvStore.writeManifest(root, KvStore.Manifest(gen, schema.toDDL, keyCol,
      buckets, base ++ committed))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = Paths.get(dir)
    messages.collect { case KvCommitMessage(s) => s }.flatten.foreach { name =>
      Files.deleteIfExists(root.resolve("staging").resolve(name))
    }
  }
}

private[sources] class KvWriterFactory(dir: String, schemaDdl: String,
    keyCol: String, buckets: Int, queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(dir, schemaDdl, keyCol, buckets, partitionId, taskId)
}

private[sources] class KvDataWriter(dir: String, schemaDdl: String,
    keyCol: String, buckets: Int, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val schema = StructType.fromDDL(schemaDdl)
  private val keyIdx = schema.fieldIndex(keyCol)
  private val types = schema.fields.map(_.dataType)
  private val root = Paths.get(dir)
  private val open = mutable.Map.empty[Int, (String, java.io.BufferedWriter)]

  private def writerFor(b: Int): java.io.BufferedWriter =
    open.getOrElseUpdate(b, {
      Files.createDirectories(root.resolve("staging"))
      val name = f"b$b%04d-p$partitionId%05d-t$taskId%08d.seg"
      val w = Files.newBufferedWriter(root.resolve("staging").resolve(name), UTF_8)
      (name, w)
    })._2

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(keyIdx), "graft-kv: null key")
    val key = row.getUTF8String(keyIdx).toString
    val b = KvStore.bucketOf(key, buckets)
    val sb = new StringBuilder
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append('\t')
      sb.append(KvStore.fieldToText(row, i, types(i)))
      i += 1
    }
    val w = writerFor(b)
    w.write(sb.toString); w.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_._2.close())
    KvCommitMessage(open.values.map(_._1).toSeq.sorted)
  }

  override def abort(): Unit = {
    open.values.foreach { case (name, w) =>
      w.close(); Files.deleteIfExists(root.resolve("staging").resolve(name))
    }
  }

  override def close(): Unit = ()
}

// ---------- read path ----------

private[sources] class KvScanBuilder(dir: String, m: KvStore.Manifest)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private val full = StructType.fromDDL(m.schemaDdl)
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new KvScan(dir, m, required)
}

private[sources] case class KvBucketPartition(bucket: Int,
    segments: Seq[String]) extends InputPartition

private[sources] class KvScan(dir: String, m: KvStore.Manifest,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv $dir gen=${m.gen} buckets=${m.buckets} " +
      s"cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    (0 until m.buckets).map { b =>
      val prefix = f"b$b%04d-"
      // segment names: g<gen>-b<bucket>-...; manifest order is commit order
      KvBucketPartition(b, m.segments.filter(s =>
        KvStore.bucketPart(s).startsWith(prefix)))
    }.filter(_.segments.nonEmpty).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(dir, m.schemaDdl, m.keyCol, required.fieldNames)
}

private[sources] class KvReaderFactory(dir: String, schemaDdl: String,
    keyCol: String, requiredFields: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KvBucketPartition]
    new KvReader(dir, schemaDdl, keyCol, requiredFields, kp.segments)
  }
}

private[sources] class KvReader(dir: String, schemaDdl: String, keyCol: String,
    requiredFields: Array[String], segments: Seq[String])
    extends PartitionReader[InternalRow] {
  private val schema = StructType.fromDDL(schemaDdl)
  private val keyIdx = schema.fieldIndex(keyCol)
  private val types = schema.fields.map(_.dataType)
  private val proj = requiredFields.map(schema.fieldIndex)

  // replay this bucket's segments in (gen, file) order: last write wins,
  // original key arrival order preserved (deterministic output).
  private val state: Iterator[Array[String]] = {
    val root = Paths.get(dir)
    val m = mutable.LinkedHashMap.empty[String, Array[String]]
    segments.foreach { seg =>
      val ls = Files.lines(root.resolve("data").resolve(seg), UTF_8)
      try ls.iterator().asScala.foreach { line =>
        val parts = line.split("\t", -1)
        m.put(parts(keyIdx), parts)
      } finally ls.close()
    }
    m.valuesIterator
  }

  private var current: Array[String] = _
  override def next(): Boolean = {
    if (!state.hasNext) return false
    current = state.next(); true
  }

  override def get(): InternalRow = {
    val out = new Array[Any](proj.length)
    var i = 0
    while (i < proj.length) {
      out(i) = KvStore.textToField(current(proj(i)), types(proj(i)))
      i += 1
    }
    new GenericInternalRow(out)
  }

  override def close(): Unit = ()
}
