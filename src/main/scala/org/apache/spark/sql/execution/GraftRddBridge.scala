package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame

/** Bridge to the `private[sql]` [[LogicalRDD]] leaf: a locally-checkpointed
  * Dataset's plan flattens to exactly this node, and the RDD it wraps is the
  * persistent (MEMORY_AND_DISK) block the checkpoint pins until unpersist.
  * Same package-tree technique as `classic.GraftPlanBridge` — no Spark
  * internals are modified, we only read the node's public case fields.
  */
object GraftRddBridge {
  /** ids of the persistent RDDs `df`'s analyzed plan references (its own
    * local checkpoints plus any upstream ones already folded in). */
  def checkpointRddIds(df: DataFrame): Seq[Int] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd.id }
}
