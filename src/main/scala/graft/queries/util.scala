package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared helpers for declared (oracle-checked) queries.
  *
  * Determinism rules (SURVEY.md §4.2): every declared query ends in a
  * total ORDER BY; floating aggregates are rounded; timestamps that
  * appear in output are formatted as strings so the DuckDB comparison is
  * immune to parquet timestamp-logical-type / timezone representation
  * differences between the two engines.
  */
object util {
  /** Timestamp -> canonical string, second precision (UTC session tz). */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Timestamp -> canonical date string. */
  def fmtDay(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** DuckDB twin of [[fmtTs]]. */
  val duckFmtTs = "%Y-%m-%d %H:%M:%S"

  /** Hash-stable sum of a DOUBLE column: accumulate in DECIMAL(38,8)
    * (exact, order-independent — double summation is not associative, so
    * a plain sum(double) can differ in the last ulp between engines and
    * even between runs as partition merge order varies), then cast back
    * and round. SQL twin: [[dsumSql]].
    */
  def dsum(c: Column, scale: Int): Column =
    round(sum(c.cast("decimal(38,8)")).cast("double"), scale)

  def dsumSql(expr: String, scale: Int): String =
    s"round(CAST(sum(CAST(($expr) AS DECIMAL(38,8))) AS DOUBLE), $scale)"

  /** Hash-stable mean: exact decimal sum, then one double division. */
  def davg(c: Column, scale: Int): Column =
    round(sum(c.cast("decimal(38,8)")).cast("double") / count(c), scale)

  def davgSql(expr: String, scale: Int): String =
    s"round(CAST(sum(CAST(($expr) AS DECIMAL(38,8))) AS DOUBLE) / count($expr), $scale)"
}
