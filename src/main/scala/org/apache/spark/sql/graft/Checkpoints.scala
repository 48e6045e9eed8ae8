package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Storage release for localCheckpoint-backed datasets.
  *
  * `Dataset.unpersist()` only removes CacheManager entries created by
  * `persist()`; the blocks backing a `localCheckpoint` belong to the
  * checkpointed RDD wrapped in the plan's `LogicalRDD` leaf (a
  * `private[sql]` node, hence this package's shim), so an iterative
  * operator that truncates lineage every round (connected components)
  * would otherwise leak every round's blocks for the life of the
  * session — `unpersist()` on those frames is a silent no-op.
  *
  * NOTE: after release the dataset CANNOT be recomputed (its lineage
  * was truncated at the checkpoint); only release a frame once every
  * consumer is done materializing it.
  */
object Checkpoints {

  /** Unpersist the checkpointed RDDs (if any) backing `ds`'s plan.
    * No-op on plans without LogicalRDD leaves, so it is safe to call
    * alongside a regular `unpersist()`.
    */
  def release(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
