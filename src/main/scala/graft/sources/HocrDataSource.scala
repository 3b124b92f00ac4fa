package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 table over a directory of `<uuid>.tar.gz` hOCR volume
  * archives — the scale path for the reference's tar scan (SURVEY.md
  * O-4, §4 "source-level pruning"):
  *
  *   spark.read.format("graft.sources.HocrDataSource")
  *     .load("/path/to/archives")
  *     .filter($"pageNum".between(2, 5))        // pushed into the tar loop
  *     .filter($"uuid" === "vol1")              // prunes whole archives
  *     .select("uuid", "pageNum", "imageId")    // hocr bytes never slurped
  *
  * Pushdown honored by the scan:
  *  - `uuid` equality / IN prunes at the FILE level — non-matching
  *    archives are never opened (the reference decompresses everything);
  *  - `pageNum` bounds are applied to the entry NAME before the entry's
  *    bytes are read — out-of-range pages are skipped, not slurped;
  *  - column pruning: when `hocr` isn't in the required schema the
  *    payload is never materialized (metadata-only scans stream the tar
  *    index, ~free).
  *
  * One InputPartition per archive: at 100 TB the unit of parallelism is
  * the volume, with tens of thousands of archives spread over executors
  * and no driver involvement beyond the file listing. Archives stream
  * through Gzip+Tar decoders — memory is bounded by one entry, not one
  * archive.
  */
class HocrDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HocrDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HocrTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object HocrDataSource {
  val schema: StructType = new StructType()
    .add("uuid", StringType)
    .add("pageNum", IntegerType)
    .add("imageId", StringType)
    .add("pageUuid", StringType)
    .add("hocr", StringType)
}

class HocrTable(path: String) extends Table with SupportsRead {
  require(path != null, "path option is required")
  override def name(): String = s"hocr:$path"
  override def schema(): StructType = HocrDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HocrScanBuilder(path)
}

class HocrScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = HocrDataSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("uuid", _: String) => true
      case In("uuid", vs) if vs.forall(_.isInstanceOf[String]) => true
      case GreaterThan("pageNum", _: Integer) => true
      case GreaterThanOrEqual("pageNum", _: Integer) => true
      case LessThan("pageNum", _: Integer) => true
      case LessThanOrEqual("pageNum", _: Integer) => true
      case EqualTo("pageNum", _: Integer) => true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new HocrScan(path, pushed, required)
}

class HocrScan(path: String, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"HocrScan path=$path PushedFilters=[${pushed.mkString(", ")}] " +
      s"ReadSchema=${required.simpleString}"

  private def uuidOf(p: Path): String =
    p.getName.stripSuffix(".tar.gz")

  private def uuidAccepted(uuid: String): Boolean = pushed.forall {
    case EqualTo("uuid", v: String) => uuid == v
    case In("uuid", vs) => vs.contains(uuid)
    case _ => true
  }

  /** The session's Hadoop configuration, captured at plan time on the
    * driver and shipped to readers as plain entries — a bare
    * `new Configuration()` would drop credentials/endpoint/defaultFS
    * settings (s3a etc.) configured via spark.hadoop.*.
    */
  private lazy val hadoopConfEntries: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
      .iterator().asScala.map(e => e.getKey -> e.getValue).toMap
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(HocrDataSourceConf.toConf(hadoopConfEntries))
    val files = fs.globStatus(new Path(hPath, "*.tar.gz"))
    if (files == null) Array.empty
    else files.iterator
      .filter(f => uuidAccepted(uuidOf(f.getPath)))    // archive-level prune
      .map(f => HocrPartition(f.getPath.toString,
        uuidOf(f.getPath)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // page bounds from the pushed filters, resolved once at plan time
    var lo = Int.MinValue
    var hi = Int.MaxValue
    pushed.foreach {
      case GreaterThan("pageNum", v: Integer) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("pageNum", v: Integer) => lo = math.max(lo, v.toInt)
      case LessThan("pageNum", v: Integer) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("pageNum", v: Integer) => hi = math.min(hi, v.toInt)
      case EqualTo("pageNum", v: Integer) =>
        lo = math.max(lo, v.toInt); hi = math.min(hi, v.toInt)
      case _ =>
    }
    HocrReaderFactory(lo, hi, required.fieldNames, hadoopConfEntries)
  }
}

object HocrDataSourceConf {
  def toConf(entries: Map[String, String]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

case class HocrPartition(file: String, uuid: String) extends InputPartition

case class HocrReaderFactory(lo: Int, hi: Int, fields: Array[String],
                             confEntries: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new HocrPartitionReader(p.asInstanceOf[HocrPartition], lo, hi, fields,
      confEntries)
}

/** Streams one archive; memory bounded by a single entry. */
class HocrPartitionReader(p: HocrPartition, lo: Int, hi: Int,
                          fields: Array[String],
                          confEntries: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val in = {
    val hPath = new Path(p.file)
    val fs = hPath.getFileSystem(HocrDataSourceConf.toConf(confEntries))
    new TarArchiveInputStream(new GzipCompressorInputStream(fs.open(hPath)))
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    var entry = in.getNextEntry
    while (entry != null) {
      if (!entry.isDirectory) {
        HocrArchive.parseEntryName(entry.getName) match {
          case Some((pageNum, imageId, pageUuid))
              if pageNum >= lo && pageNum <= hi =>
            val values: Array[Any] = fields.map {
              case "uuid" => UTF8String.fromString(p.uuid)
              case "pageNum" => pageNum
              case "imageId" => UTF8String.fromString(imageId)
              case "pageUuid" => UTF8String.fromString(pageUuid)
              case "hocr" => UTF8String.fromBytes(in.readAllBytes())
            }
            row = InternalRow.fromSeq(values.toIndexedSeq)
            return true
          case _ => // skipped: bytes never read
        }
      }
      entry = in.getNextEntry
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
