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
}
