package graft.examples

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan auditor: prints the formatted physical plan of each named query
  * (or all) so scan pushdown (`PushedFilters`/`ReadSchema`), broadcast
  * joins, and WholeStageCodegen spans can be reviewed.
  * `sbt "runMain graft.examples.Explain q_agg_sum q_star_join"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
