package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) table layout for co-located joins.
  *
  * The reference joins its fact table to the population dimension once per
  * report run (`report_processor.py:235-238`); at 100 TB the analogous join
  * keyed on a high-cardinality column is re-run constantly (daily reports
  * over the same fact table), and paying a full shuffle of the fact side on
  * EVERY run is the single biggest avoidable cost. Bucketing amortizes that
  * shuffle into the write: `bucketBy(n, key)` hash-partitions rows into a
  * fixed number of buckets at save time, and Spark's scan then reports
  * `HashPartitioning(key, n)` as its output partitioning, so a sort-merge
  * join between two tables bucketed on the same key with the same bucket
  * count plans with NO Exchange on either side (and with `sortBy` at write
  * time, no Sort either). The shuffle happens once, at layout time, instead
  * of once per query.
  *
  * Scale notes:
  *  - bucket count is the parallelism floor for scans of the table; at
  *    100 TB pick buckets so each bucket file group is a few hundred MB
  *    (e.g. 4096), not the 8 used in local tests.
  *  - one task writes one bucket per input partition; to avoid a
  *    small-files explosion, repartition by the bucket key before the
  *    bucketed write (done below) so each bucket is written by one task.
  *  - Spark's bucketing requires a catalog table (`saveAsTable`) — the
  *    bucket spec lives in the table metadata, not the files. We create a
  *    dedicated database with an explicit LOCATION so nothing touches the
  *    default warehouse.
  */
object Bucketing {

  /** Create (idempotently) a database whose files live under `location`.
    *
    * If the catalog does NOT know the database but its location survives
    * on disk (a previous process died between write and drop), the stale
    * files are removed first — `saveAsTable` refuses to create a managed
    * table over a non-empty location, and the catalog is the source of
    * truth here, not the filesystem.
    */
  def ensureDatabase(spark: SparkSession, db: String, location: String): Unit = {
    if (!spark.catalog.databaseExists(db)) {
      val p = java.nio.file.Paths.get(location)
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally walk.close()
      }
    }
    spark.sql(
      s"CREATE DATABASE IF NOT EXISTS $db LOCATION '${location.replace("'", "''")}'")
  }

  /** Write `df` as a managed parquet table bucketed AND sorted by `key`.
    *
    * The pre-write `repartition(numBuckets, key)` aligns task partitioning
    * with the bucket function so each bucket is one file, not
    * one-per-input-partition.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(numBuckets, df(key))
      .write
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Inner equi-join of two same-key, same-bucket-count tables. With both
    * sides bucketed this plans as SortMergeJoin with zero Exchange and zero
    * Sort — assert via [[isShuffleFree]] in tests.
    *
    * Spark stopped exposing bucket sort order by default (SPARK-28173:
    * with >1 file per bucket the scan would need an expensive merge-read),
    * so the sorted-scan conf is opted into here explicitly — safe because
    * [[writeBucketed]] repartitions by the bucket key pre-write, which
    * guarantees exactly one file per bucket. Without the conf the join is
    * still exchange-free; it merely re-sorts each bucket in memory.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    spark.table(leftTable).join(spark.table(rightTable), key)
  }

  /** True when the executed plan contains no shuffle exchange (the scan's
    * bucket partitioning satisfied the join's distribution requirement).
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
