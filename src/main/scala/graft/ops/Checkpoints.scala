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

  /** anchor checkpoint-RDD id → feeder checkpoint-RDD ids that must be
    * freed together with it (see [[link]]). Entries are tiny (int sets)
    * and are pruned as their anchors are released.
    */
  private val linked =
    scala.collection.concurrent.TrieMap.empty[Int, Set[Int]]

  /** Register feeder checkpoints that are NOT reachable from a result's
    * plan so a targeted [[release]](result) still frees them. The
    * pattern: an iterative operator checkpoints an input (edge list,
    * comparison matrix) that is then consumed only by per-round frames
    * which are THEMSELVES checkpointed — the flat LogicalRDD rounds hide
    * the feeder from the returned plan, so without a link only the
    * harness-wide [[releaseAll]] sweep would ever free it. Operators
    * whose scaladoc names the release-the-result caller contract
    * (kcorePeel, lpaCommunities, hits, btFromWins) call this on return;
    * CheckpointLifecycleSpec asserts release(result) drains them to 0.
    */
  def link(anchor: DataFrame, feeders: DataFrame*): Unit = {
    val extra = feeders.flatMap(pinnedIds).toSet
    val anchors = pinnedIds(anchor)
    if (extra.nonEmpty && anchors.nonEmpty)
      anchors.foreach { id =>
        linked.updateWith(id)(s => Some(s.getOrElse(Set.empty) ++ extra))
      }
  }

  /** Unpersist the checkpointed RDDs backing `df`, plus any feeders
    * [[link]]ed to them (see SAFETY above). */
  def release(df: DataFrame): Unit = {
    val persistent = df.sparkSession.sparkContext.getPersistentRDDs
    val direct = pinnedIds(df)
    val all = direct ++ direct.flatMap(id => linked.remove(id).getOrElse(Set.empty))
    all.foreach(id => persistent.get(id).foreach(_.unpersist(blocking = false)))
  }

  /** Post-action sweep: unpersist EVERY persistent RDD in the session
    * except those a `keep` frame still depends on. */
  def releaseAllExcept(spark: SparkSession, keep: DataFrame*): Unit = {
    val keepIds = keep.flatMap(pinnedIds).toSet
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!keepIds(id)) { rdd.unpersist(blocking = false); linked.remove(id) }
    }
  }

  def releaseAll(spark: SparkSession): Unit = releaseAllExcept(spark)
}
