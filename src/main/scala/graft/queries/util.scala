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

  /** Exact-scale decimal sum emitted as DOUBLE via a scaled BIGINT.
    *
    * Emitting `CAST(decimal AS DOUBLE)` directly is only portable while
    * value × 10^scale < 2^53: past that, DuckDB's decimal→double
    * converts the int128 payload to double FIRST and divides by
    * 10^scale SECOND (two IEEE roundings) while Spark's
    * BigDecimal.doubleValue rounds once — a 1-ulp divergence the sf1
    * sweep caught on 6-decimal charge sums (~2.8e16 scaled). Routing
    * through BIGINT forces both engines down the identical path: exact
    * integer (no rounding), one bigint→double conversion (correctly
    * rounded in both), one double division (identical operands). Valid
    * while value × 10^scale < 2^63 — three more decades; past THAT,
    * emit the decimal itself.
    */
  def dsumExact(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale).toLong
    ((sum(c.cast("decimal(38,8)")).cast(s"decimal(38,$scale)") * lit(f))
      .cast("long").cast("double") / lit(f.toDouble))
  }

  def dsumExactSql(expr: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"CAST(CAST(CAST(sum(CAST(($expr) AS DECIMAL(38,8))) AS DECIMAL(38,$scale)) * $f AS BIGINT) AS DOUBLE) / $f.0"
  }
}
