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

  /** Actions a non-matching listener will observe before concluding its
    * result was discarded and expiring itself (unpersisting the — never
    * materialized — intermediates as it goes): speculatively built plans
    * must not leak a listener, and an un-matching listener must not tax
    * every future action with a canonical-plan scan forever.
    */
  private val MaxMissedActions = 64

  /** Returns `result` unchanged; after the first completed action that
    * contains `result`'s plan, unpersists `intermediates` (non-blocking)
    * and deregisters itself. If the caller never materializes the
    * result, persist() was lazy too — no blocks were ever allocated —
    * and the listener self-expires after [[MaxMissedActions]] unrelated
    * actions. Results carrying a checkpoint-backed intermediate never
    * miss-expire (their storage is real and non-recomputable); their
    * listener waits for the consuming action however late it comes.
    *
    * Known semantic: two structurally identical LIVE results share one
    * release epoch (the marker is the canonical plan, so the first
    * consuming action fires both listeners). Correctness is unaffected;
    * the second result just recomputes instead of reading cache — and
    * identical-plan results would be better served by one invocation
    * anyway.
    */
  def releaseAfterAction(result: DataFrame, intermediates: Seq[Dataset[_]]): DataFrame = {
    val spark = result.sparkSession
    val marker = result.queryExecution.analyzed.canonicalized
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val misses = new java.util.concurrent.atomic.AtomicInteger(0)
    // checkpoint-backed intermediates were materialized EAGERLY and
    // cannot be recomputed once released, so the miss-counter must
    // never expire them before the result's consuming action runs
    // (which may come arbitrarily many unrelated actions later in a
    // contended session — the r6 advice defect). Only lazy persists —
    // where a never-materialized cache allocated nothing — expire.
    val expirable = !intermediates.exists(
      org.apache.spark.sql.graft.Checkpoints.isCheckpointBacked)
    object listener extends QueryExecutionListener {
      private def release(): Unit =
        if (done.compareAndSet(false, true)) {
          intermediates.foreach { ds =>
            ds.unpersist(false)
            // checkpoint-backed intermediates (connected components):
            // unpersist alone is a no-op on their storage; the shim
            // frees blocks and reliable-checkpoint files for real. A
            // released checkpoint cannot be recomputed, so a result
            // registered with a checkpointed intermediate supports ONE
            // materializing action (the Verify/Bench/collect flow).
            org.apache.spark.sql.graft.Checkpoints.release(ds)
          }
          spark.listenerManager.unregister(listener)
        }
      private def maybeRelease(qe: QueryExecution): Unit = {
        // the action's analyzed tree still holds the operator's subtree
        // verbatim (cache substitution happens later, between analysis
        // and optimization), so canonical-plan containment identifies
        // "an action that consumed this result" exactly
        val hit =
          try qe.analyzed.find(_.canonicalized == marker).isDefined
          catch { case _: Throwable => false }
        // abandoned checkpoint-backed results keep their (cheap,
        // plan-scan-only) listener until session end rather than risk
        // failing a late consumer with missing blocks
        if (hit || (expirable && misses.incrementAndGet() > MaxMissedActions)) release()
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
