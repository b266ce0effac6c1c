package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 batch source `graft-synth`: a deterministic synthetic
 * documents table generated in the executors (no file I/O), the testing /
 * benchmarking source a 100 TB pipeline wants — you can materialize an
 * arbitrarily large corpus with zero storage and verified statistics.
 *
 *   spark.read.format("graft-synth")
 *     .option("rows", 1000000).option("seed", "g9").option("partitions", 32)
 *     .load()
 *
 * Real engine plumbing, not a toy:
 *  - **column pruning** (`SupportsPushDownRequiredColumns`): the text body
 *    is only synthesized when the query actually reads `text`/`n_chars` —
 *    a `groupBy(lang)` scan never touches it (the analog of parquet
 *    ReadSchema pruning);
 *  - **filter pushdown** (`SupportsPushDownFilters`): `doc_id` range
 *    predicates narrow the generated id range BEFORE partition planning,
 *    so `planInputPartitions` emits fewer/smaller splits (the analog of
 *    partition pruning) and fully-handled predicates leave no residual
 *    Filter in the plan;
 *  - every field is md5-derived from (seed, doc_id), so any DuckDB oracle
 *    can replay the whole table — see `OraclesPlus.q279`.
 *
 * Field derivation (shared contract with the oracle, do not change one
 * side alone): with `ma = md5(seed:a:id)` and `mw = md5(seed:w:id)` as
 * 32-char hex strings,
 *   n_words = 8 + (u32(ma[0:8]) mod 25)           ∈ [8, 32]
 *   lang    = LANGS[u8(ma[8:10]) mod 4]
 *   source  = SOURCES[u8(ma[10:12]) mod 5]
 *   word_j  = VOCAB16[hexdigit(mw, j)]            j < n_words
 *   text    = words joined by single spaces; n_chars = len(text)
 */
object SynthDocs {
  val VOCAB16: Array[String] = Array("key", "agg", "row", "scan", "slow",
    "fast", "table", "value", "part", "hash", "merge", "batch", "line",
    "sort", "window", "spark")
  val LANGS: Array[String] = Array("en", "de", "fr", "es")
  val SOURCES: Array[String] = Array("web", "wiki", "code", "news", "forum")

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** All fields for one row; `needText` skips the body synthesis. */
  def row(seed: String, id: Long, needText: Boolean): (Int, String, String, Int, String) = {
    val ma = md5hex(s"$seed:a:$id")
    val nWords = 8 + (java.lang.Long.parseLong(ma.substring(0, 8), 16) % 25).toInt
    val lang = LANGS(Integer.parseInt(ma.substring(8, 10), 16) % 4)
    val source = SOURCES(Integer.parseInt(ma.substring(10, 12), 16) % 5)
    if (!needText) return (nWords, lang, source, -1, null)
    val mw = md5hex(s"$seed:w:$id")
    val sb = new StringBuilder
    var j = 0
    while (j < nWords) {
      if (j > 0) sb.append(' ')
      sb.append(VOCAB16(Character.digit(mw.charAt(j), 16)))
      j += 1
    }
    val text = sb.toString
    (nWords, lang, source, text.length, text)
  }
}

class SynthDocsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(new CaseInsensitiveStringMap(properties))
}

private[sources] class SynthTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft-synth"
  override def schema(): StructType = SynthDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(
      caseInsensitiveOptions.getLong("rows", 1000L),
      Option(caseInsensitiveOptions.get("seed")).getOrElse("graft"),
      caseInsensitiveOptions.getInt("partitions", 4))
}

private[sources] class SynthScanBuilder(rows: Long, seed: String, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo: Long = 0L
  private var hi: Long = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthDocs.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("doc_id", _: Long) | GreaterThan("doc_id", _: Long) |
           GreaterThanOrEqual("doc_id", _: Long) | LessThan("doc_id", _: Long) |
           LessThanOrEqual("doc_id", _: Long) | IsNotNull(_) => true
      case _ => false
    }
    // saturating successor: v+1 at Long.MaxValue would wrap to MinValue and
    // (since these filters are reported fully handled) silently flip the
    // bound; MaxValue itself is a correct saturation because doc_id < rows.
    def succ(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    accepted.foreach {
      case EqualTo("doc_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, succ(v))
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, succ(v))
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, succ(v))
      case IsNotNull(_) => ()
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new SynthScan(lo, hi, seed, parts, required)
}

private[sources] case class SynthRangePartition(lo: Long, hi: Long) extends InputPartition

private[sources] class SynthScan(lo: Long, hi: Long, seed: String, parts: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth range=[$lo,$hi) seed=$seed cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    if (n == 0) return Array.empty
    val p = math.min(parts.toLong, n).toInt
    (0 until p).map { i =>
      SynthRangePartition(lo + i * n / p, lo + (i + 1) * n / p)
    }.filter(r => r.hi > r.lo).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(seed, required)
}

private[sources] class SynthReaderFactory(seed: String, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[SynthRangePartition]
    new SynthReader(r.lo, r.hi, seed, required)
  }
}

private[sources] class SynthReader(lo: Long, hi: Long, seed: String,
    required: StructType) extends PartitionReader[InternalRow] {
  private var id = lo - 1
  private val fields = required.fieldNames
  private val needText = fields.contains("text") || fields.contains("n_chars")
  private val needAttrs = needText ||
    fields.exists(f => f == "lang" || f == "source" || f == "n_words")

  override def next(): Boolean = { id += 1; id < hi }

  override def get(): InternalRow = {
    val (nWords, lang, source, nChars, text) =
      if (needAttrs) SynthDocs.row(seed, id, needText)
      else (0, null, null, 0, null)
    val out = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      out(i) = fields(i) match {
        case "doc_id" => id
        case "lang" => UTF8String.fromString(lang)
        case "source" => UTF8String.fromString(source)
        case "n_words" => nWords
        case "n_chars" => nChars
        case "text" => UTF8String.fromString(text)
      }
      i += 1
    }
    new GenericInternalRow(out)
  }

  override def close(): Unit = ()
}
