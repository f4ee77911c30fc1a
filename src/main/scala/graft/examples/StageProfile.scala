package graft.examples

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage attribution for one registered query: runs
  * `SparkEntry.queries(name)` under the close config and prints each
  * completed stage's executor run/CPU time with its call site, so a
  * query-level `run_ms` number can be split into "which shuffle
  * boundary paid it". Iterates twice and reports the second pass
  * (post-JIT), matching the bench's min-of-iters discipline.
  *
  * `SPARK_GRAFT_QUERY=q_item_sim SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *  sbt "runMain graft.examples.StageProfile"`
  */
object StageProfile {
  final case class StageRow(id: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, shuffleReadMb: Double,
      shuffleWriteMb: Double, recordsRead: Long)

  final class StageListener extends SparkListener {
    val rows = mutable.ArrayBuffer.empty[StageRow]
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val m = si.taskMetrics
      rows += StageRow(si.stageId, si.details.linesIterator
          .find(l => l.contains("graft") && !l.contains("StageProfile"))
          .getOrElse(si.name).trim,
        si.numTasks, m.executorRunTime, m.executorCpuTime / 1000000L,
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        m.shuffleWriteMetrics.bytesWritten / 1e6,
        m.inputMetrics.recordsRead)
    }
  }

  def main(args: Array[String]): Unit = {
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERY", "q_item_sim")
      .split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    sys.env.get("SPARK_GRAFT_OBJAGG_FALLBACK")
      .foreach(v => spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))
    sys.env.get("SPARK_GRAFT_AQE")
      .foreach(v => spark.conf.set("spark.sql.adaptive.enabled", v))
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val q = graft.SparkEntry.queries(name)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        q(spark, sfDir).explain("formatted")
      if (sys.env.contains("SPARK_GRAFT_FINALPLAN")) {
        val df = q(spark, sfDir)
        df.collect()
        println("---- AQE final plan ----")
        println(df.queryExecution.executedPlan.toString)
      }
      // noop write, SAME as the bench: count() would let column
      // pruning strip the aggregate functions / output projections
      // and time a much cheaper plan (measured: q_profile 3.6 s of
      // real run_ms profiled as 10 ms under count())
      def drive(): Unit = q(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      drive() // warm pass: JIT + codegen + IO cache
      val lst = new StageListener
      spark.sparkContext.addSparkListener(lst)
      val t0 = System.nanoTime()
      drive()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat before reading
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(lst)
      // no rows field: the noop sink discards output executor-side, so
      // an output-row count here would always be a misleading 0
      // (ADVICE r11); per-stage recordsRead below carries the volumes
      println(f"== $name%s wall=$wall%.2fs stages=${lst.rows.size}%d")
      for (r <- lst.rows.sortBy(-_.runMs))
        println(f"  run=${r.runMs}%6dms cpu=${r.cpuMs}%6dms tasks=${r.tasks}%3d " +
          f"sr=${r.shuffleReadMb}%7.1fMB sw=${r.shuffleWriteMb}%7.1fMB " +
          f"in=${r.recordsRead}%9d  ${r.name.take(110)}%s")
    }
    spark.stop()
  }
}
