package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scoped release of the intermediate frames an operator persists.
  *
  * Operators like [[NearDup]] cache a heavy intermediate (gram sets,
  * signature frames) that several downstream joins read; without a
  * lifecycle, every invocation permanently pins shuffle-sized blocks in
  * executor storage — in a long-lived session running many dedup jobs,
  * storage fills with dead blocks (eviction thrash, GC pressure; the
  * round-3 hygiene defect).
  *
  * [[releaseAfterAction]] keeps the operator's public API lazy (the
  * returned DataFrame is still a declarative plan — `.explain`, further
  * composition, and Catalyst all see the real join tree) while making
  * the caches self-releasing: a one-shot [[QueryExecutionListener]]
  * watches for the first action whose analyzed plan contains the
  * operator's result subtree, then unpersists the intermediates. The
  * caches therefore live exactly as long as the single materializing
  * action that needs them — the caller's count / write / collect — and
  * a re-invocation of the operator builds (and releases) fresh ones.
  *
  * Listener callbacks run on the session's listener bus thread; tests
  * asserting post-action hygiene flush the bus first (see
  * [[org.apache.spark.sql.graft.ListenerBus.flush]]).
  */
private[graft] object CacheLifecycle {

  /** Returns `result` unchanged; after the first completed action that
    * contains `result`'s plan, unpersists `intermediates` (non-blocking)
    * and deregisters itself. If the caller never materializes the
    * result, persist() was lazy too — no blocks were ever allocated.
    */
  def releaseAfterAction(result: DataFrame, intermediates: Seq[Dataset[_]]): DataFrame = {
    val spark = result.sparkSession
    val marker = result.queryExecution.analyzed.canonicalized
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    object listener extends QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        // the action's analyzed tree still holds the operator's subtree
        // verbatim (cache substitution happens later, between analysis
        // and optimization), so canonical-plan containment identifies
        // "an action that consumed this result" exactly
        val hit =
          try qe.analyzed.find(_.canonicalized == marker).isDefined
          catch { case _: Throwable => false }
        if (hit && done.compareAndSet(false, true)) {
          intermediates.foreach(_.unpersist(false))
          spark.listenerManager.unregister(listener)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    result
  }
}
