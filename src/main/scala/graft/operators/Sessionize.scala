package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based batch sessionization: assign a per-key session id that
  * increments whenever the time since the previous event of the same key
  * exceeds `gap`.
  *
  * Cost model: one shuffle-sort by (`by`, `ts`) — the lag and the running
  * sum share the same window frame, so Catalyst evaluates both in a
  * single Window exec over a single Exchange. Linear at 100 TB provided
  * no single key's event stream outgrows an executor (sessionization is
  * inherently per-key-sequential; for a pathological hot key, split by
  * coarse time range first and merge boundary sessions).
  *
  * The streaming twin is `session_window(ts, gap)` /
  * `flatMapGroupsWithState` (graft.streaming).
  */
object Sessionize {

  /** Adds `session_id` (1-based per key) to `df`. */
  def withSessionId(df: DataFrame, ts: String, by: Seq[String], gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(by.map(col): _*).orderBy(col(ts))
    val gapMicros = gapSeconds * 1000000L
    val newSession = when(
      lag(col(ts), 1).over(order).isNull ||
        unix_micros(col(ts)) - unix_micros(lag(col(ts), 1).over(order)) > gapMicros,
      1L).otherwise(0L)
    df.withColumn("session_id",
      sum(newSession).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
