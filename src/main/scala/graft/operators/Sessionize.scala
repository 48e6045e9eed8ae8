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
  * inherently per-key-sequential; for a pathological hot key,
  * [[withSessionIdSplit]] splits by coarse time range and merges
  * boundary sessions).
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

  /** [[withSessionId]] for a pathological hot key — the "split by coarse
    * time range and merge boundary sessions" plan, provided: identical
    * `session_id`s, but the per-key sort partitions by (key,
    * `splitSeconds`-wide time bucket), so one key's stream spreads over
    * `range/split` shuffle partitions instead of pinning one executor.
    *
    * Merge step: per (key, bucket) the summary frame (one row per
    * nonempty bucket — tiny) records first/last event time and the
    * local session count. A bucket's first local session merges with
    * the previous NONEMPTY bucket's last session iff the boundary gap
    * is within `gapSeconds` (consecutive events across the boundary are
    * exactly that pair, so this is the unsplit predicate verbatim; a
    * session spanning many buckets chains through consecutive merges).
    * Global id = local id + (sessions numbered before this bucket) −
    * (1 if merging). The summary window is per-key sequential but over
    * buckets, not events — `range/split` rows, not millions.
    *
    * Pick `splitSeconds` so one bucket of the hottest key fits an
    * executor (e.g. a day for a key logging millions of events/day).
    */
  def withSessionIdSplit(df: DataFrame, ts: String, by: Seq[String], gapSeconds: Long,
      splitSeconds: Long): DataFrame = {
    require(splitSeconds > 0, s"splitSeconds must be positive, got $splitSeconds")
    val gapMicros = gapSeconds * 1000000L
    val splitMicros = math.multiplyExact(splitSeconds, 1000000L)
    // pmod keeps the bucket a true floor for pre-1970 timestamps
    val d2 = df.withColumn("__t", unix_micros(col(ts)))
      .withColumn("__bkt",
        ((col("__t") - pmod(col("__t"), lit(splitMicros))) / splitMicros).cast("long"))
    val wLoc = Window.partitionBy((by :+ "__bkt").map(col): _*).orderBy(col(ts))
    val newLocal = when(
      lag(col("__t"), 1).over(wLoc).isNull ||
        col("__t") - lag(col("__t"), 1).over(wLoc) > gapMicros,
      1L).otherwise(0L)
    val d3 = d2.withColumn("__lsid",
      sum(newLocal).over(wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val summary = d3.groupBy((by :+ "__bkt").map(col): _*)
      .agg(min(col("__t")).as("__first"), max(col("__t")).as("__last"),
        max(col("__lsid")).as("__nloc"))
    val wKey = Window.partitionBy(by.map(col): _*).orderBy(col("__bkt"))
    val offsets = summary
      .withColumn("__m",
        when(col("__first") - lag(col("__last"), 1).over(wKey) <= gapMicros, 1L)
          .otherwise(0L))
      .withColumn("__off",
        coalesce(sum(col("__nloc") - col("__m"))
          .over(wKey.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) - col("__m"))
      .select(by.map(col) ++ Seq(col("__bkt"), col("__off")): _*)
    // join keys share the local window's (key, bucket) partitioning;
    // the offsets side is summary-sized. Null-safe equality: null `by`
    // keys / null ts (null __bkt) form real groups in the unsplit
    // window variant (partitionBy groups nulls), so a plain equi-join
    // would silently drop those rows here and break the "identical
    // session_ids" contract. EqualNullSafe keys still plan as a hash
    // join — same cost.
    val keys = by :+ "__bkt"
    val d3a = d3.alias("__d")
    val oa = offsets.alias("__o")
    val cond = keys.map(k => col(s"__d.$k") <=> col(s"__o.$k")).reduce(_ && _)
    d3a.join(oa, cond, "inner")
      .select(d3.columns.map(c => col(s"__d.$c")) :+ col(s"__o.__off"): _*)
      .withColumn("session_id", col("__lsid") + col("__off"))
      .drop("__t", "__bkt", "__lsid", "__off")
  }
}
