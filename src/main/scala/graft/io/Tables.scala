package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark 4
    * rejects outright. Read nanos as LONG (legacy conf) and rebuild the
    * µs timestamp with INTEGER division — `div`, not `/`: a double
    * round-trip at 1.7e18 nanos loses sub-ms precision (2^53 < ns
    * epoch).
    *
    * SESSION-WIDE EFFECT, by necessity: the conf is re-read from the
    * session at scan EXECUTION time (ParquetFileFormat bakes it into the
    * hadoop conf when the RDD is built), so a set/restore scoped to this
    * method would break the later action, and ParquetOptions exposes no
    * per-read equivalent (verified against the 4.1.2 jars). The flag
    * only changes how TIMESTAMP(NANOS) columns surface (as LONG); no
    * other testdata table has one, and any caller-supplied parquet with
    * nanos timestamps would otherwise fail the read outright — so the
    * blast radius is "reads that would have thrown now yield LONG".
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
