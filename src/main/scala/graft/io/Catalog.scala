package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-listing source (SURVEY.md §2.1 S3/S4): the object-store /
  * remote-directory listings the sync engine diffs.
  */
object Catalog {

  /** Recursive driver-side listing as raw tuples
    * `(name, path, length, modTimeMs)` — shared by [[listFiles]] and
    * the DataSource V2 connector ([[graft.sources.CatalogSource]]).
    */
  def listRaw(dir: String,
              conf: org.apache.hadoop.conf.Configuration)
  : Seq[(String, String, Long, Long)] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) Seq.empty
    else {
      val it = fs.listFiles(path, true)
      val buf = scala.collection.mutable.ArrayBuffer[(String, String, Long, Long)]()
      while (it.hasNext) {
        val f = it.next()
        buf += ((f.getPath.getName, f.getPath.toString, f.getLen,
          f.getModificationTime))
      }
      buf.toSeq
    }
  }

  /** List a directory (recursively) as a DataFrame
    * `(name, path, length, mod_time)` — the engine-side equivalent of
    * the reference's `get_s3_files()` LIST → `{key: etag}`
    * (`Task_1_sync_bls_files.py:77-85`). Listing happens driver-side
    * (as in the reference); content hashing is distributed — see
    * [[withContentHash]].
    */
  def listFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    listRaw(dir, spark.sparkContext.hadoopConfiguration)
      .toDF("name", "path", "length", "mod_time")
  }

  /** Distributed content hashing: read each listed file as binary and
    * md5 it — the reference streams 8KB chunks through hashlib
    * (`Task_1_sync_bls_files.py:99-105`); here each file is one task and
    * the hash is the Catalyst `md5` over the content column.
    *
    * `recursive = true` descends into plain subdirectories
    * (`recursiveFileLookup`, which also disables partition-style
    * directory inference — the right semantics for a FILE catalog);
    * the default keeps the reference's flat-prefix LIST behavior.
    * `name` stays the basename either way — callers needing a
    * collision-free key under recursion derive it from `path`
    * (see SyncJob's relative-path key).
    */
  def withContentHash(spark: SparkSession, dir: String,
                      recursive: Boolean = false): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", recursive.toString)
      .load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        col("path"), col("length"),
        md5(col("content")).as("hash"))

  /** Extract href targets from an HTML directory index (SURVEY.md S4,
    * the reference's bs4 scrape `Task_1_sync_bls_files.py:42-48`):
    * `<a href="...">` values, minus directories and parent links.
    */
  def hrefsFromHtml(html: DataFrame, htmlCol: String = "html"): DataFrame =
    html
      .select(explode(
        regexp_extract_all(col(htmlCol), lit("href=\"([^\"]+)\""), lit(1)))
        .as("href"))
      .filter(!col("href").endsWith("/") && col("href") =!= ".." &&
        !col("href").startsWith("?") && !col("href").startsWith("#"))

  /** The reference's latest-partition pick (`sorted(files)[-1]`,
    * `report_processor.py:66-67`): lexicographic max among keys
    * matching prefix/suffix.
    */
  def latestKey(listing: DataFrame, prefix: String, suffix: String): DataFrame =
    listing
      .filter(col("name").startsWith(prefix) && col("name").endsWith(suffix))
      .orderBy(col("name").desc)
      .limit(1)
}
