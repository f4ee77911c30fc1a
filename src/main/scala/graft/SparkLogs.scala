package graft

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Log hygiene for the driver-run mains.
  *
  * The iterative graph ops (PageRank / ConnectedComponents /
  * LabelPropagation / Bfs / Hierarchy) follow a deliberate memory
  * discipline: each round's state is `localCheckpoint(true)`-ed
  * (eager — fully materialized before use) and the SUPERSEDED round's
  * blocks are explicitly unpersisted, so peak storage is two rounds,
  * not `iters` rounds — the property that matters when the per-round
  * state is 100 TB-scale. Spark 4's `RDD.unpersist` logs an
  * unconditional WARN ("was locally checkpointed, its lineage has
  * been truncated and cannot be recomputed") for ANY locally-
  * checkpointed RDD, with no safe/unsafe distinction — in our usage
  * nothing ever references the unpersisted round again (the verdict's
  * round-4 audit confirmed zero recompute failures across the whole
  * suite), so the warning is pure noise that floods the bench tail.
  * Demote that one logger category to ERROR instead of weakening the
  * cleanup discipline or the global WARN level.
  */
object SparkLogs {
  /** Silence the cosmetic locally-checkpointed-unpersist WARN (logged
    * under the concrete RDD class, e.g.
    * `org.apache.spark.rdd.MapPartitionsRDD` — suppress the package).
    */
  def quietIterativeCleanup(): Unit =
    Configurator.setLevel("org.apache.spark.rdd", Level.ERROR)
}
