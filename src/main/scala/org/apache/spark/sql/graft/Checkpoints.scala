package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Storage release for checkpoint-backed datasets.
  *
  * `Dataset.unpersist()` only removes CacheManager entries created by
  * `persist()`; the blocks backing a `localCheckpoint` (and the files
  * backing a reliable `checkpoint`) belong to the checkpointed RDD
  * wrapped in the plan's `LogicalRDD` leaf (a `private[sql]` node,
  * hence this package's shim), so an iterative operator that truncates
  * lineage every round (connected components) would otherwise leak
  * every round's storage for the life of the session — `unpersist()`
  * on those frames is a silent no-op.
  *
  * NOTE: after release the dataset CANNOT be recomputed (its lineage
  * was truncated at the checkpoint); only release a frame once every
  * consumer is done materializing it.
  */
object Checkpoints {

  /** Free the storage of the checkpointed RDDs (if any) backing `ds`'s
    * plan: unpersist their blocks (localCheckpoint) and delete their
    * reliable-checkpoint files (checkpoint to a checkpoint dir), if
    * present. No-op on plans without LogicalRDD leaves, so it is safe
    * to call alongside a regular `unpersist()`.
    */
  def release(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.foreach {
      case lr: LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        // a reliable checkpoint pins FILES, not blocks: delete its
        // rdd-N directory so per-round truncation doesn't fill the
        // checkpoint dir for the session lifetime
        lr.rdd.getCheckpointFile.foreach { path =>
          val p = new org.apache.hadoop.fs.Path(path)
          try p.getFileSystem(lr.rdd.sparkContext.hadoopConfiguration).delete(p, true)
          catch { case _: java.io.IOException => () }
        }
      case _ => ()
    }

  /** Read the session's checkpoint directory without side effects
    * (`SparkContext.checkpointDir` is private[spark]; this package is
    * inside org.apache.spark, hence the shim).
    */
  def checkpointDirOf(sc: org.apache.spark.SparkContext): Option[String] =
    sc.checkpointDir

  /** Restore a previously-read checkpoint directory verbatim —
    * `setCheckpointDir` can't express "back to unset" (null NPEs on a
    * non-local master) and would mint a fresh UUID subdir.
    */
  def restoreCheckpointDir(sc: org.apache.spark.SparkContext,
      dir: Option[String]): Unit =
    sc.checkpointDir = dir

  /** Whether `ds`'s plan is backed by an already-materialized
    * checkpoint (local or reliable). Such frames hold real storage NOW
    * — unlike a lazy `persist()` — so lifecycle code must not expire
    * them before their consumer runs (they cannot be recomputed).
    */
  def isCheckpointBacked(ds: Dataset[_]): Boolean =
    ds.queryExecution.analyzed.find {
      case lr: LogicalRDD => lr.rdd.isCheckpointed
      case _ => false
    }.isDefined
}
