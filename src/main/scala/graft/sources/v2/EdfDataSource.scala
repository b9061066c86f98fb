package graft.sources.v2

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.EdfFile
import graft.sources.EdfFile.EdfHeader

/** DataSource V2 registration of the EDF reader: `spark.read.format("edf")
  * .load(path)` (SURVEY.md §2 A1 as a first-class source).
  *
  * Scan planning mirrors EdfFile.read — header-only driver work, (file,
  * record-range) input partitions — plus V2 column pruning: the reader
  * materializes only requested fields, and when the `value` column is NOT
  * requested the partition reader synthesizes rows from header arithmetic
  * alone, never touching sample bytes (a count(*) over 100 TB of EDF reads
  * ~KB of headers).
  */
class EdfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "edf"

  // accept user-specified schemas (validated in getTable below)
  override def supportsExternalMetadata(): Boolean = true

  /** The `paths` option is the JSON string array DataFrameReader.load(…)
    * encodes — parse it with a real JSON parser (paths may contain commas,
    * quotes, escapes), never by splitting on ','.
    */
  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { js =>
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
      require(node != null && node.isArray, s"'paths' option must be a JSON string array, got: $js")
      (0 until node.size).map { i =>
        val e = node.get(i)
        require(e.isTextual, s"'paths' option must contain only strings, got element: $e")
        e.asText
      }
    }.getOrElse(Seq.empty)
    val single = Option(options.get("path")).toSeq
    (multi ++ single).distinct
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = EdfFile.sampleSchema

  /** A user-supplied schema is honored when it is a name/type-compatible
    * subset of the sample schema (the reader materializes by field name,
    * so any projection is cheap) and rejected loudly otherwise — rows must
    * never be reinterpreted under a schema the scan doesn't produce.
    *
    * Name matching honors the session's resolver (`spark.sql.caseSensitive`,
    * default case-insensitive) — `schema("CHANNEL string")` must be
    * accepted wherever `select("CHANNEL")` resolves. Matched fields are
    * canonicalized to the source's own casing so the by-name partition
    * reader recognizes them.
    */
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val full = EdfFile.sampleSchema
    val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
    val canonical = schema.fields.map { f =>
      val ref = full.fields.find(r => resolver(r.name, f.name)).getOrElse(throw new IllegalArgumentException(
        s"edf source has no column '${f.name}'; available: ${full.fieldNames.mkString(", ")}"))
      require(ref.dataType == f.dataType,
        s"edf column '${f.name}' is ${ref.dataType.simpleString}, user schema requests ${f.dataType.simpleString}")
      f.copy(name = ref.name)
    }
    new EdfTable(paths(new CaseInsensitiveStringMap(properties)), StructType(canonical))
  }
}

final class EdfTable(paths: Seq[String], tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = s"edf(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EdfScanBuilder(paths, tableSchema)
}

final class EdfScanBuilder(paths: Seq[String], tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new EdfScan(paths, required)
}

final class EdfScan(paths: Seq[String], required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"EdfScan(paths=${paths.size}, columns=[${required.fieldNames.mkString(",")}])"

  override def planInputPartitions(): Array[InputPartition] = {
    val target = 128L << 20
    paths.flatMap { p =>
      val h = EdfFile.readHeader(p)
      val recsPerSplit = math.max(1, (target / math.max(1L, h.recordBytes)).toInt)
      (0 until h.nbDataRec by recsPerSplit).map { lo =>
        EdfInputPartition(p, lo, math.min(h.nbDataRec, lo + recsPerSplit)): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val entries = org.apache.spark.sql.SparkSession.active match {
      case s => EdfFile.captureConfEntries(s)
    }
    new EdfReaderFactory(required.fieldNames, entries)
  }
}

final case class EdfInputPartition(path: String, recordLo: Int, recordHi: Int) extends InputPartition

final class EdfReaderFactory(fields: Array[String],
    confEntries: Seq[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EdfInputPartition]
    new EdfPartitionReader(p, fields, confEntries)
  }
}

/** Streams one record-range; if `value` is not in the projection, rows are
  * synthesized from header arithmetic without reading sample bytes.
  */
final class EdfPartitionReader(part: EdfInputPartition, fields: Array[String],
    confEntries: Seq[(String, String)]) extends PartitionReader[InternalRow] {

  private val needsValue = fields.contains("value")
  private val h: EdfHeader = EdfFile.readHeader(part.path)
  private val recBytes = h.recordBytes
  private val sigOffsets = h.signals.scanLeft(0L)((acc, s) => acc + s.nrSamples * 2L)
  private val annIdx = h.signals.indexWhere(_.isAnnotation)
  private val durUs = (h.duration * 1e6).toLong
  private val dataSignals = h.signals.zipWithIndex.filterNot(_._1.isAnnotation)
  private val fileUtf = UTF8String.fromString(part.path)
  private val labels = h.signals.map(s => UTF8String.fromString(s.label))
  private val units = h.signals.map(s => UTF8String.fromString(s.physDim))

  private var opened = false
  private lazy val in = {
    val pth = new Path(part.path)
    opened = true
    pth.getFileSystem(EdfFile.confFromEntries(confEntries)).open(pth)
  }
  private val buf = new Array[Byte](recBytes.toInt)

  private var rec = part.recordLo - 1
  private var sigPos = 0      // index into dataSignals
  private var sampleIdx = 0
  private var recStartUs = 0L
  private var current: InternalRow = _

  private def advanceRecord(): Boolean = {
    rec += 1
    if (rec >= part.recordHi) return false
    if (needsValue || h.isDiscontiguous) in.readFully(h.headerBytes + rec * recBytes, buf)
    recStartUs =
      if (h.isDiscontiguous && annIdx >= 0) {
        val off = sigOffsets(annIdx).toInt
        val len = h.signals(annIdx).nrSamples * 2
        val tal = new String(buf, off, len, java.nio.charset.StandardCharsets.US_ASCII)
        h.startUs + (tal.split("\u0014\u0014", 2).head.toDouble * 1e6).toLong
      } else h.startUs + rec.toLong * durUs
    sigPos = 0
    sampleIdx = 0
    true
  }

  override def next(): Boolean = {
    if (rec < part.recordLo) { if (!advanceRecord()) return false }
    while (sigPos < dataSignals.size && sampleIdx >= dataSignals(sigPos)._1.nrSamples) {
      sigPos += 1; sampleIdx = 0
    }
    if (sigPos >= dataSignals.size) {
      if (!advanceRecord()) return false
      return next()
    }
    val (sig, sIdx) = dataSignals(sigPos)
    val n = sig.nrSamples
    val i = sampleIdx
    val values: Array[Any] = fields.map {
      case "file"        => fileUtf
      case "channel_idx" => sIdx
      case "channel"     => labels(sIdx)
      case "unit"        => units(sIdx)
      case "rate"        => h.sampleRate(sIdx)
      case "record_idx"  => rec.toLong
      case "sample_idx"  => rec.toLong * n + i
      case "ts_us"       => recStartUs + i.toLong * durUs / n
      case "value" =>
        val base = sigOffsets(sIdx).toInt
        val lo = buf(base + 2 * i) & 0xff
        val hi = buf(base + 2 * i + 1)
        sig.bitValue * (sig.offset + ((hi << 8) | lo).toDouble)
    }
    current = InternalRow.fromSeq(values.toIndexedSeq)
    sampleIdx += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (opened) { try in.close() catch { case _: Throwable => } }
}
