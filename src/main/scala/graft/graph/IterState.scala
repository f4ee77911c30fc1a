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
  def release(df: DataFrame): Unit = rdd(df).foreach { r =>
    pinned.synchronized { pinned.remove(r) }
    r.unpersist(false)
  }

  // Checkpoint leaves that must SURVIVE the harness's between-query
  // block release ([[releaseAllExceptPinned]]): the session caches
  // (cluster relation, minhash index) hold lineage-CUT frames across
  // queries by design — unpersisting them would make the next consumer
  // fail with missing checkpoint blocks, not recompute. Weak identity
  // set: an entry disappears with its RDD, and RDD-id recycling across
  // SparkContext restarts can never protect the wrong block.
  private val pinned: java.util.Set[org.apache.spark.rdd.RDD[_]] =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.rdd.RDD[_],
        java.lang.Boolean])

  /** Mark a cross-query session-cached checkpoint as exempt from
    * [[releaseAllExceptPinned]]. [[release]] unpins automatically.
    */
  def pin(df: DataFrame): Unit =
    rdd(df).foreach(r => pinned.synchronized { pinned.add(r) })

  /** Harness hygiene between timed queries (Bench/Verify): drop every
    * persisted RDD except the pinned session caches. The iterative /
    * dedup operators materialize round state DURING a run that they
    * cannot unpersist themselves (the returned frame must stay alive
    * until the caller's action finishes); left in place across a
    * 252-query session those blocks fill the storage pool and every
    * later task pays eviction churn for execution memory (r13
    * forensics: untouched tail queries inflated up to 10× in run_ms,
    * zero GC, walls rising monotonically per iteration; normal in
    * isolation).
    */
  def releaseAllExceptPinned(
      spark: org.apache.spark.sql.SparkSession): Unit = {
    val keep = pinned.synchronized {
      val s = new java.util.IdentityHashMap[
        org.apache.spark.rdd.RDD[_], java.lang.Boolean]
      pinned.forEach(r => s.put(r, java.lang.Boolean.TRUE))
      s
    }
    spark.sparkContext.getPersistentRDDs.values
      .filter(r => !keep.containsKey(r))
      .foreach(_.unpersist(false))
  }
}
