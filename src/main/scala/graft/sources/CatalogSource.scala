package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector exposing a directory listing as a TABLE:
  * `spark.read.format("graft-catalog").load(dir)` yields
  * `(name, path, length, mod_time, md5)` — the sync engine's catalog
  * (reference `get_s3_files()` LIST → `{key: etag}`,
  * `Task_1_sync_bls_files.py:77-85`) as a first-class source instead
  * of a driver-side helper ([[graft.io.Catalog.listFiles]] remains the
  * lightweight form).
  *
  * Why a real connector and not a helper: the V2 contract gives the
  * engine seams a 100 TB catalog needs —
  *  - **column-pruning pushdown** (`SupportsPushDownRequiredColumns`):
  *    `md5` is computed by READING each file, so a projection that
  *    doesn't ask for it must never touch file contents. The scan's
  *    `readSchema()` is the proof (asserted in SourcesSpec), not a
  *    code comment.
  *  - **distributed evaluation**: files are split round-robin into
  *    input partitions; hashing runs executor-side, one task per
  *    partition — the listing is driver-side (like every file index)
  *    but the expensive column is not.
  */
class CatalogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-catalog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CatalogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CatalogTable(properties.get("path"))
}

object CatalogSource {
  val schema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("path", StringType),
    StructField("length", LongType),
    StructField("mod_time", TimestampType),
    StructField("md5", StringType)))
}

private[sources] class CatalogTable(path: String)
    extends Table with SupportsRead {
  require(path != null, "graft-catalog requires a load(path)")
  override def name(): String = s"graft-catalog($path)"
  override def schema(): StructType = CatalogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CatalogScanBuilder(path)
}

private[sources] class CatalogScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = CatalogSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new CatalogScan(path, required)
}

private[sources] case class FilesPartition(
    files: Array[(String, String, Long, Long)]) extends InputPartition

private[sources] class CatalogScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-catalog $path readSchema=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side: reuse the shared recursive listing with the active
    // session's hadoop conf (fs settings, credentials)
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val files = graft.io.Catalog.listRaw(path, conf).toArray
    val slices = math.max(1, math.min(4, files.length))
    (0 until slices).map(i => FilesPartition(
      files.zipWithIndex.collect { case (f, j) if j % slices == i => f }))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CatalogReaderFactory(required)
}

private[sources] class CatalogReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
  : PartitionReader[InternalRow] =
    new CatalogReader(partition.asInstanceOf[FilesPartition], required)
}

/** Executor-side reader: one row per listed file; `md5` (the only
  * field that costs a file READ) is computed iff the pruned schema
  * asks for it.
  */
private[sources] class CatalogReader(partition: FilesPartition,
                                     required: StructType)
    extends PartitionReader[InternalRow] {
  private val wantMd5 = required.fieldNames.contains("md5")
  private var i = -1

  override def next(): Boolean = { i += 1; i < partition.files.length }

  override def get(): InternalRow = {
    val (name, filePath, len, modMs) = partition.files(i)
    val values = required.fieldNames.map {
      case "name" => UTF8String.fromString(name)
      case "path" => UTF8String.fromString(filePath)
      case "length" => len
      case "mod_time" => modMs * 1000L // micros
      case "md5" => UTF8String.fromString(md5Hex(filePath))
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  private def md5Hex(filePath: String): String = {
    val p = new Path(filePath)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val digest = java.security.MessageDigest.getInstance("MD5")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](8192) // reference streams 8KB chunks too
      var n = in.read(buf)
      while (n >= 0) {
        digest.update(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    digest.digest().map("%02x".format(_)).mkString
  }

  override def close(): Unit = ()
}
