package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{And, DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual, Not, Or, StringContains, StringEndsWith, StringStartsWith}
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
  *  - **filter pushdown** (`SupportsPushDownFilters`): predicates on
  *    the LISTING metadata (`name`/`path`/`length`) prune the file set
  *    BEFORE partition planning, so files excluded by
  *    `name LIKE 'pr.%'`-style filters are never md5-hashed — at
  *    catalog scale (millions of objects) the filter decides how many
  *    files get READ, not just how many rows survive. Pushed filters
  *    are reported (visible in `.explain`) but ALSO returned as
  *    residuals, so Spark re-evaluates them post-scan — pruning is an
  *    optimization, never the correctness boundary (exact null /
  *    collation semantics stay with the engine).
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

/** Test observability (the `HiveCatalogMetrics` pattern from Spark's
  * own source): counts md5 file reads so SourcesSpec can prove that
  * filter pushdown skipped the excluded files' content, not just
  * their rows.
  */
private[graft] object CatalogMetrics {
  val md5Reads = new java.util.concurrent.atomic.LongAdder
}

/** Driver-side evaluation of pushed filters against listing metadata
  * `(name, path, length)`. Conservative by construction: any filter
  * shape or column outside the supported set simply does not prune
  * (`matches` defaults true for unknown nodes) — the engine-side
  * residual evaluation owns exactness.
  */
private[sources] object CatalogFilters {
  private val cols = Set("name", "path", "length")

  def prunable(f: Filter): Boolean = f match {
    case And(l, r) => prunable(l) && prunable(r)
    case Or(l, r) => prunable(l) && prunable(r)
    case Not(c) => prunable(c)
    case EqualTo(a, _) => cols(a)
    case In(a, _) => cols(a)
    case GreaterThan(a, _) => cols(a)
    case GreaterThanOrEqual(a, _) => cols(a)
    case LessThan(a, _) => cols(a)
    case LessThanOrEqual(a, _) => cols(a)
    case StringStartsWith(a, _) => cols(a)
    case StringEndsWith(a, _) => cols(a)
    case StringContains(a, _) => cols(a)
    case IsNotNull(a) => cols(a)
    case _ => false
  }

  /** Keep the file unless the filter PROVABLY rejects it. Kleene
    * three-valued evaluation: an unevaluable leaf is `None`
    * (unknown), which propagates through And/Or/Not correctly — a
    * plain "unknown = true" default would invert to a wrong prune
    * under `Not`.
    */
  def keeps(f: Filter, name: String, path: String, length: Long)
  : Boolean = eval(f, name, path, length).getOrElse(true)

  private def eval(f: Filter, name: String, path: String, length: Long)
  : Option[Boolean] = {
    def str(a: String): Option[String] = a match {
      case "name" => Some(name)
      case "path" => Some(path)
      case _ => None
    }
    // Spark compares StringType in UTF8String BINARY order (UTF-8
    // bytes, unsigned); Java's String.compareTo is UTF-16 code-unit
    // order, and the two DIVERGE for supplementary characters (an
    // emoji-named file sorts before U+F900 in UTF-16 but after it in
    // UTF-8). A wrong ordering here over-prunes — the file is never
    // read, so the engine's residual filter cannot bring the row back
    // — so range comparisons must replicate the engine's byte order.
    def utf8Cmp(x: String, y: String): Int = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < a.length && i < b.length) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    def cmp(a: String, v: Any): Option[Int] = (a, v) match {
      case ("length", n: Number) => n match {
        case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
             _: java.lang.Long =>
          Some(java.lang.Long.compare(length, n.longValue()))
        case _ =>
          // Fractional literal: longValue() truncation would turn
          // length < 5.7 into length < 5 and wrongly PRUNE a length-5
          // file — and pruning is unrecoverable (the engine residual
          // never sees the row). Spark normalizes integral-column
          // comparisons before pushdown (UnwrapCastInBinaryComparison)
          // so this is unreachable today; the guard keeps the
          // evaluator's "unknown never prunes" contract for any future
          // path that ships a fractional value.
          val d = n.doubleValue()
          if (d == Math.rint(d) && !d.isInfinite &&
              d >= Long.MinValue.toDouble && d <= Long.MaxValue.toDouble)
            Some(java.lang.Long.compare(length, d.toLong))
          else None
      }
      case (_, s: String) => str(a).map(utf8Cmp(_, s))
      case _ => None
    }
    f match {
      case And(l, r) =>
        (eval(l, name, path, length), eval(r, name, path, length)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case Or(l, r) =>
        (eval(l, name, path, length), eval(r, name, path, length)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case Not(c) => eval(c, name, path, length).map(!_)
      case EqualTo(a, v) => cmp(a, v).map(_ == 0)
      case In(a, vs) =>
        val es = vs.toSeq.map(v => cmp(a, v).map(_ == 0))
        if (es.contains(Some(true))) Some(true)
        else if (es.forall(_ == Some(false))) Some(false)
        else None
      case GreaterThan(a, v) => cmp(a, v).map(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v).map(_ >= 0)
      case LessThan(a, v) => cmp(a, v).map(_ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v).map(_ <= 0)
      case StringStartsWith(a, v) => str(a).map(_.startsWith(v))
      case StringEndsWith(a, v) => str(a).map(_.endsWith(v))
      case StringContains(a, v) => str(a).map(_.contains(v))
      case IsNotNull(_) => Some(true) // listing metadata is never null
      case _ => None
    }
  }
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
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = CatalogSource.schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(CatalogFilters.prunable)
    // everything stays residual: the scan prunes files with the
    // pushed subset, the engine re-applies ALL filters on the rows
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new CatalogScan(path, required, pushed)
}

private[sources] case class FilesPartition(
    files: Array[(String, String, Long, Long)]) extends InputPartition

private[sources] class CatalogScan(path: String, required: StructType,
                                   pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-catalog $path readSchema=${required.fieldNames.mkString(",")}" +
      s" PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side: reuse the shared recursive listing with the active
    // session's hadoop conf (fs settings, credentials)
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    // pushed filters prune HERE — before partition planning, so an
    // excluded file is never shipped to an executor, let alone hashed
    val files = graft.io.Catalog.listRaw(path, conf)
      .filter { case (name, p, len, _) =>
        pushed.forall(CatalogFilters.keeps(_, name, p, len)) }
      .toArray
    val slices = math.max(1, math.min(4, files.length))
    (0 until slices).map(i => FilesPartition(
      files.zipWithIndex.collect { case (f, j) if j % slices == i => f }))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // capture the SESSION hadoop conf driver-side (credentials, fs
    // impls) as plain entries — Configuration itself isn't
    // serializable, and a fresh executor-side `new Configuration()`
    // would lose exactly the settings that made the driver-side
    // LISTING succeed (s3a credentials etc.)
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val entries = {
      val it = conf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    new CatalogReaderFactory(required, entries)
  }
}

private[sources] class CatalogReaderFactory(
    required: StructType, confEntries: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
  : PartitionReader[InternalRow] =
    new CatalogReader(partition.asInstanceOf[FilesPartition], required,
      confEntries)
}

/** Executor-side reader: one row per listed file; `md5` (the only
  * field that costs a file READ) is computed iff the pruned schema
  * asks for it.
  */
private[sources] class CatalogReader(partition: FilesPartition,
                                     required: StructType,
                                     confEntries: Array[(String, String)])
    extends PartitionReader[InternalRow] {
  private val wantMd5 = required.fieldNames.contains("md5")
  private var i = -1
  // rebuilt once per reader from the shipped session entries
  private lazy val hconf = {
    val c = new org.apache.hadoop.conf.Configuration()
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }

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
    CatalogMetrics.md5Reads.increment()
    val p = new Path(filePath)
    val fs = p.getFileSystem(hconf)
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
