package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Shared round-state discipline for the iterative graph operators
  * (ConnectedComponents / PageRank / LabelPropagation / Bfs /
  * Hierarchy): each round's frame is `localCheckpoint(true)`-ed
  * (eager — materialized before use, lineage cut so plans don't grow
  * with the round count) and the SUPERSEDED round's blocks are
  * explicitly released, keeping peak storage at two rounds. Shared
  * beyond graph/: [[graft.sim.Similarity.kCenterGreedy]] uses the same
  * discipline for its per-round min-distance state.
  */
private[graft] object IterState {
  /** The materialized RDD behind an eagerly-localCheckpoint'd frame;
    * None when the frame isn't a checkpoint leaf (then there is
    * nothing to release).
    */
  def rdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Release a superseded checkpoint's storage (non-blocking). */
  def release(df: DataFrame): Unit = rdd(df).foreach(_.unpersist(false))
}
