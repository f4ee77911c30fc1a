package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2.1 S8–S11). Retries/atomicity are the file
  * committer's job in Spark — the reference's hand-rolled 3×-retry
  * upload loop (`Task_1_sync_bls_files.py:118-132`) has no analog here
  * by design.
  */
object Sinks {

  /** Timestamped output path, mirroring the reference's
    * `population_data_<ts>.json` key scheme
    * (`Task2_Fetch_api_data.py:40`). The timestamp is driver-side
    * wall-clock formatted `yyyyMMdd_HHmmss`.
    */
  def timestampedPath(baseDir: String, prefix: String,
                      suffix: String = ""): String = {
    val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd_HHmmss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    s"$baseDir/$prefix$ts$suffix"
  }

  /** S9 JSON sink. */
  def writeJson(df: DataFrame, dir: String, overwrite: Boolean = true): Unit =
    df.write.mode(if (overwrite) "overwrite" else "errorifexists").json(dir)

  /** Parquet sink, optionally partitioned — the engine's canonical
    * at-rest format.
    */
  def writeParquet(df: DataFrame, dir: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir)
  }

  /** Parquet sink with COLUMN BLOOM FILTERS on `bloomCols` — the
    * point-lookup scale lever for columns the layout is NOT sorted or
    * partitioned by: min/max row-group stats are useless on a
    * high-cardinality unordered key (every row group spans most of
    * the domain), but a per-row-group bloom filter lets the reader
    * skip row groups on equality predicates at ~1 byte/value. The
    * complement of [[graft.io.Clustering]] (Z-order helps the SORTED
    * dimensions; blooms cover the keys you didn't sort by) and of the
    * footer stats index ([[StatsIndex]] — file-level min/max).
    *
    * `ndv` sizes each filter (expected distinct values per row
    * group); parquet-mr derives the bit size from it at the default
    * 1% false-positive rate. Readers need no cooperation: Spark's
    * parquet filter pushdown consults the bloom automatically on
    * `col = literal` scans.
    *
    * Dictionary interplay (measured, parquet-mr 1.16): a column chunk
    * that stays FULLY dictionary-encoded writes NO bloom filter — the
    * dictionary already answers exact membership. At real scale a
    * high-cardinality key overflows the dictionary page and falls
    * back to plain encoding, so blooms appear exactly where they're
    * needed; but a test-sized chunk would silently produce none, so
    * `disableDictionary` (default true) forces plain encoding on the
    * bloom columns to make the behavior scale-independent. Pass false
    * to keep dictionary encoding and accept per-chunk adaptivity.
    */
  def writeParquetBloom(df: DataFrame, dir: String,
                        bloomCols: Seq[String],
                        ndv: Long = 100000L,
                        partitionBy: Seq[String] = Nil,
                        disableDictionary: Boolean = true): Unit = {
    var w = df.write.mode("overwrite")
    bloomCols.foreach { c =>
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
      if (disableDictionary)
        w = w.option(s"parquet.enable.dictionary#$c", "false")
    }
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetFileBytes` files — the standing maintenance op behind
    * every streaming/incremental sink (each micro-batch writes at
    * least one file per partition; a day of 1-minute batches leaves
    * thousands of KB-sized files whose per-file open/footer cost
    * dominates scans at 100 TB). Target count is derived from the
    * CURRENT on-disk byte size (listing metadata only, no data read).
    *
    * Swap protocol (the HDFS-style FS API has no multi-path atomic
    * op, so honesty about the window matters): rewrite to
    * `<dir>.__compact_tmp`, then `dir→__compact_old`,
    * `__compact_tmp→dir`, delete old. Each rename RESULT is checked
    * and a failure throws before anything destructive; residue from a
    * prior crash is detected up front — `__compact_old` present
    * WITHOUT `dir` means a swap died between renames (the live data is
    * in `__compact_old`) and the call refuses so a human restores it,
    * while stale temps alongside a live `dir` are garbage and are
    * cleared. A concurrent reader can still observe the one-rename
    * window where `dir` is briefly absent (path-not-found, fail-fast),
    * but never a HALF-compacted directory.
    *
    * Refuses hive-partitioned layouts: a flat rewrite would read
    * `k=v` directories as data columns and silently destroy partition
    * pruning for every downstream reader — compact each partition
    * directory individually instead.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(s"$dir.__compact_old")
    val tmpP = new org.apache.hadoop.fs.Path(s"$dir.__compact_tmp")
    require(!(fs.exists(old) && !fs.exists(p)),
      s"compact: $old exists but $dir does not — a previous swap " +
        "crashed between renames; the live data is in the __compact_old " +
        "directory, restore it manually before compacting")
    if (fs.exists(old)) fs.delete(old, true)   // garbage from a crash
    if (fs.exists(tmpP)) fs.delete(tmpP, true) // after the rewrite
    require(fs.exists(p), s"compact: $dir does not exist")
    require(!fs.listStatus(p).exists(s =>
        s.isDirectory && s.getPath.getName.contains("=")),
      s"compact: $dir has hive-style partition subdirectories; " +
        "compact each partition directory individually")
    val bytes = Catalog.listRaw(dir, conf)
      .filter(_._1.endsWith(".parquet")).map(_._3).sum
    val nFiles = math.max(1L,
      (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(dir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(tmpP.toString)
    def mv(a: org.apache.hadoop.fs.Path, b: org.apache.hadoop.fs.Path): Unit =
      require(fs.rename(a, b), s"compact: rename $a -> $b failed")
    mv(p, old)
    mv(tmpP, p)
    fs.delete(old, true)
  }

  /** S11 record sink: rows as JSON strings (the reference's
    * `to_dict('records')` log emission, `report_processor.py:186`).
    */
  def toJsonRecords(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("record"))

  /** S10 object delete, driven by the CDC merge's delete set: removes
    * each listed path. Action, not a plan — runs driver-side over the
    * (small) delete list, like the reference's per-key delete loop
    * (`Task_1_sync_bls_files.py:189-198`).
    */
  def deletePaths(spark: org.apache.spark.sql.SparkSession,
                  paths: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    paths.foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      fs.delete(path, false)
    }
  }
}
