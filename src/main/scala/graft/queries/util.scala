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

  /** [[davg]] with the rounding itself made engine-exact (r18
    * correctness fix). davg computes an exact rational mean s/n but
    * rounds it through each engine's `round(double, k)`: Spark rounds
    * the double's exact binary expansion (HALF_UP on the BigDecimal),
    * DuckDB multiplies by 10^k first — an inexact double multiply —
    * and rounds that, so a mean landing on (or within an ulp of) a
    * half-boundary at scale k can split the engines by one last-digit
    * ulp. The sf0.001 fixture caught exactly one such cell
    * (ts_between_time, 68.92875 → 68.9288 vs 68.9287). Here the
    * half-away-from-zero rounding — what both engines' round() means —
    * runs in EXACT integer arithmetic: with S = s·10⁸ (exact BIGINT,
    * the dsumExact device) and B = n·10^k,
    * r = (2·|S| + B) div (2·B) and the result is sign(S)·r/10^k — the
    * k-scaled integer converts to double exactly and the final
    * division is one identical IEEE op in both engines. Envelope:
    * 2·|s|·10⁸ + B < 2⁶³ ⇒ |sum| ≲ 4.6·10¹⁰ at 8 fractional digits;
    * past that, widen S through DECIMAL (DuckDB's HUGEINT already
    * does).
    *
    * Takes the column NAME (the expression references it and the
    * aggregate sums three times — Catalyst dedupes identical aggregate
    * functions into one buffer).
    */
  def davgExact(colName: String, scale: Int): Column = {
    val f = math.pow(10, scale).toLong
    val s = s"CAST(sum(CAST($colName AS DECIMAL(38,8))) * 100000000 AS BIGINT)"
    val b = s"(count($colName) * $f)"
    expr(s"CAST((CASE WHEN $s < 0 THEN -1 ELSE 1 END) * " +
      s"((2 * abs($s) + $b) div (2 * $b)) AS DOUBLE) / $f.0")
  }

  /** DuckDB twin of [[davgExact]] (`//` floors like Spark's `div` for
    * the positive operands abs() guarantees).
    */
  def davgExactSql(expr: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    val s = s"CAST(sum(CAST(($expr) AS DECIMAL(38,8))) * 100000000 AS BIGINT)"
    val b = s"(count($expr) * $f)"
    s"CAST((CASE WHEN $s < 0 THEN -1 ELSE 1 END) * " +
      s"((2 * abs($s) + $b) // (2 * $b)) AS DOUBLE) / $f.0"
  }

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
