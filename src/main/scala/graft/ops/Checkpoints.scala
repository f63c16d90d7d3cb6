package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.GraftRddBridge

/** Lifecycle management for `localCheckpoint` intermediates.
  *
  * A local checkpoint persists its RDD at MEMORY_AND_DISK and TRUNCATES
  * lineage — the data can never be recomputed, so a checkpointed frame
  * that is no longer referenced does nothing but pin executor memory for
  * the rest of the session. Two call patterns keep that bounded:
  *
  *  - loops: after round k's frame is EAGERLY materialized, round k-1's
  *    frame is garbage — [[release]] it as the loop advances, so in-flight
  *    pinned blocks stay O(1) per operator instead of O(rounds)
  *    (TextOps.connectedComponents / connectedComponentsStar do this);
  *  - harnesses: after a query's consuming action completes, nothing in
  *    the session needs ANY of its checkpoints — Bench/Verify call
  *    [[releaseAll]] between catalog entries, so a 440-query run does not
  *    accumulate hundreds of pinned RDDs in the shared JVM (measured:
  *    untouched queries inflated 3-20x under that GC pressure in the
  *    round-11 full-run bench).
  *
  * SAFETY: because lineage is truncated, [[release]] on a frame that an
  * UNMATERIALIZED consumer still references loses data (the consumer's
  * action then fails) — only release frames whose successors are already
  * materialized, or sweep after the final action.
  */
object Checkpoints {
  /** ids of the persistent RDDs `df`'s plan pins. */
  def pinnedIds(df: DataFrame): Set[Int] =
    GraftRddBridge.checkpointRddIds(df).toSet

  /** Unpersist the checkpointed RDDs backing `df` (see SAFETY above). */
  def release(df: DataFrame): Unit = {
    val persistent = df.sparkSession.sparkContext.getPersistentRDDs
    pinnedIds(df).foreach(id =>
      persistent.get(id).foreach(_.unpersist(blocking = false)))
  }

  /** Post-action sweep: unpersist EVERY persistent RDD in the session
    * except those a `keep` frame still depends on. */
  def releaseAllExcept(spark: SparkSession, keep: DataFrame*): Unit = {
    val keepIds = keep.flatMap(pinnedIds).toSet
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!keepIds(id)) rdd.unpersist(blocking = false)
    }
  }

  def releaseAll(spark: SparkSession): Unit = releaseAllExcept(spark)
}
