package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Post-execution shuffle accounting: total records and bytes written
  * through every shuffle exchange of an EXECUTED plan (AQE final plan
  * included). Local wall time misprices shuffles — a local[n] exchange
  * is a memcpy, a cluster exchange is disk + network — so plan-choice
  * arguments at 100 TB need the MEASURED shuffle volume alongside the
  * measured wall (see STRESS.md's PIT-join record, where the two
  * measures rank the candidate plans in opposite order).
  */
object ShuffleStats {

  final case class Totals(exchanges: Int, records: Long, bytes: Long)

  /** Execute `ds`'s plan (a private RDD action — `ds.count()` would
    * build a SEPARATE QueryExecution whose metrics this walk never
    * sees), then walk it unwrapping AQE and reused exchanges and sum
    * shuffle write metrics. Reused exchanges count once (their metrics
    * live on the original node). Measurement tool — materializes every
    * column of every row.
    */
  def of(ds: Dataset[_]): Totals = {
    ds.queryExecution.executedPlan.execute().count()
    val seen = scala.collection.mutable.Set[Int]()
    var n = 0; var recs = 0L; var bytes = 0L
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        // an executed AQE plan wraps each materialized stage (shuffle,
        // broadcast, and — since Spark 4 — the result itself) in a
        // query-stage node; the real subtree (and its metrics) is .plan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child)
        case s: ShuffleExchangeLike if !seen(System.identityHashCode(s)) =>
          seen += System.identityHashCode(s)
          n += 1
          recs += s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
          bytes += s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
        case _ => ()
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(ds.queryExecution.executedPlan)
    Totals(n, recs, bytes)
  }
}
