package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish testdata tables.
  *
  * One parquet file per table under `sfDir` (see TESTDATA.md). All query
  * entry points take `sfDir` so the same plan runs at any scale factor —
  * the parquet scans are the leaves Catalyst pushes filters/projections
  * into, so nothing here should materialize or cache eagerly.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Normalize an event-time column to TIMESTAMP (instant / LTZ)
    * regardless of how the source parquet encoded it. The driver has
    * regenerated `events.parquet` with a different `ts` physical
    * encoding in two consecutive rounds — TIMESTAMP(NANOS) (Spark 4
    * surfaces it as LONG under `nanosAsLong`), then naive
    * `timestamp[us]` (surfaced as TIMESTAMP_NTZ when
    * `inferTimestampNTZ` is on) — so the loader normalizes by TYPE,
    * not by provenance. Policy (per encoding actually observed):
    *
    *  - TIMESTAMP: already an instant — pass through.
    *  - TIMESTAMP_NTZ: naive wall-clock whose writer meant UTC; the
    *    cast reinterprets it in the session zone, and every entry
    *    point pins `spark.sql.session.timeZone=UTC`, so this is a pure
    *    relabeling (DuckDB reads the same file as naive-UTC → oracle
    *    hashes unaffected).
    *  - LONG: an epoch count, nanos or micros. Discriminated per row
    *    by magnitude with INTEGER division (`div`, not `/`: a double
    *    round-trip at 1.7e18 ns loses sub-ms precision, 2^53 < ns
    *    epoch). The 1e17 threshold reads as year 5138 in µs and 1973
    *    in ns — unambiguous for any plausible event time.
    */
  def normalizeTs(df: DataFrame, c: String = "ts"): DataFrame =
    if (!df.schema.fieldNames.contains(c)) df
    else df.schema(c).dataType match {
      case TimestampType    => df
      case TimestampNTZType => df.withColumn(c, col(c).cast(TimestampType))
      case LongType =>
        df.withColumn(c,
          when(abs(col(c)) > lit(100000000000000000L),
            expr(s"timestamp_micros($c div 1000)"))
            .otherwise(expr(s"timestamp_micros($c)")))
      case _ => df
    }

  /** events.parquet, with `ts` normalized to TIMESTAMP (see
    * [[normalizeTs]] for the encoding history).
    *
    * `nanosAsLong` SESSION-WIDE EFFECT, by necessity: the conf is
    * re-read from the session at scan EXECUTION time (ParquetFileFormat
    * bakes it into the hadoop conf when the RDD is built), so a
    * set/restore scoped to this method would break the later action,
    * and ParquetOptions exposes no per-read equivalent (verified
    * against the 4.1.2 jars). The flag only changes how
    * TIMESTAMP(NANOS) columns surface (as LONG); without it a nanos
    * file fails the read outright — blast radius is "reads that would
    * have thrown now yield LONG", which [[normalizeTs]] then repairs.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
