package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DataSource V2 catalog connector: values vs the io.Catalog helpers,
  * column-pruning pushdown, and distributed partitioning.
  */
class SourcesSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("cat_src").toString
    Seq("a.txt" -> "alpha", "b.txt" -> "beta bytes", "c.json" -> "{}")
      .foreach { case (n, content) =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(d, n), content)
      }
    d
  }

  test("graft-catalog rows match the listing + distributed md5 helpers") {
    val got = spark.read.format("graft-catalog").load(dir)
      .select("name", "length", "md5")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val wantHash = graft.io.Catalog.withContentHash(spark, dir)
      .select("name", "length", "hash")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.toSeq === wantHash.toSeq)
    val wantList = graft.io.Catalog.listFiles(spark, dir)
      .select("name").collect().map(_.getString(0)).sorted
    assert(got.map(_._1).toSeq === wantList.toSeq)
  }

  test("projection pushes into the scan: no md5 read unless asked") {
    val pruned = spark.read.format("graft-catalog").load(dir)
      .select("name", "length")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(scans === Seq(Seq("name", "length")),
      s"scan must carry only the projected columns: $scans")
    // and the full projection does include md5 in the scan
    val full = spark.read.format("graft-catalog").load(dir)
    val fullScan = full.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(fullScan.head.contains("md5"))
  }

  test("files spread over multiple input partitions") {
    val df = spark.read.format("graft-catalog").load(dir)
    val parts = df.select(
      org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().count()
    assert(parts >= 2, s"3 files should span >= 2 partitions, got $parts")
    assert(df.count() === 3)
  }

  test("missing directory yields an empty frame, not an error") {
    assert(spark.read.format("graft-catalog")
      .load(s"$dir/definitely_missing").count() === 0)
  }
}
