package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.operators.{Ewm, Sessionize}
import graft.operators.OrderByOnce.Ops
import util._

/** Window / ordered / time-series surface (SURVEY.md §2.5, §2.8 batch).
  *
  * All window queries partition by a key (user_id / customer) so the
  * sort parallelizes across keys — a global-order window with no
  * PARTITION BY would serialize onto one task at 100 TB. Ordering always
  * includes a unique tiebreaker (event_id / orderkey): ROWS frames and
  * ranking are peer-order-sensitive, so a non-total sort would be
  * nondeterministic across engines (SURVEY.md §4.2).
  */
/** The Holt-Winters additive period-7 fold, shared verbatim by the
  * batch query ([[Windows.tsHwForecast]]) and its streaming twin
  * ([[graft.streaming.Streams.hwForecastStream]]) so "batch ≡ stream"
  * is equality of one operation list, not of two implementations that
  * happen to agree. All arithmetic is double; the caller supplies
  * daily-cent values (exact integers entering double once).
  */
private[graft] object HoltWinters {
  val Period = 7
  val InitLen = 2 * Period // two-period classical init

  /** State after the first 14 observed days: init at position 7
    * (l₇ = mean of week 1, b₇ = (Σweek2 − Σweek1)/49, sᵢ = xᵢ − l₇),
    * then the recursion applied for positions 8..14. Mutates and
    * returns the seasonal array.
    */
  def init(first14: Array[Double]): (Double, Double, Array[Double]) = {
    require(first14.length == InitLen, s"need $InitLen values")
    val s1 = first14.take(7).sum // integer-valued: order-free
    val s2 = first14.slice(7, 14).sum
    var l = s1 / 7
    var b = (s2 - s1) / 49
    val s = Array.tabulate(7)(j => first14(j) - s1 / 7)
    var t = 7
    while (t < InitLen) {
      val (ln, bn) = step(l, b, s, first14(t), t)
      l = ln; b = bn; t += 1
    }
    (l, b, s)
  }

  /** One recursion step at 0-based position `t` (phase t mod 7);
    * mutates the seasonal slot, returns the new (level, trend).
    */
  def step(l: Double, b: Double, s: Array[Double], x: Double, t: Int): (Double, Double) = {
    val p = t % 7
    val sOld = s(p)
    val lNew = 0.3 * (x - sOld) + 0.7 * (l + b)
    val bNew = 0.2 * (lNew - l) + 0.8 * b
    s(p) = 0.1 * (x - l - b) + 0.9 * sOld
    (lNew, bNew)
  }

  /** Emission row: (n_days, level, trend, final seasonal slot,
    * 7-step-ahead forecast), each /100 cents→units and 6-dp rounded.
    */
  def emit(n: Long, l: Double, b: Double, s: Array[Double]): (Long, Double, Double, Double, Double) = {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val sT = s(((n - 1) % 7).toInt)
    (n, r6(l / 100), r6(b / 100), r6(sT / 100), r6((l + 7 * b + sT) / 100))
  }
}

object Windows {

  private def byUser = Window.partitionBy("user_id")

  /** Count-based rolling window (Dask `rolling(3)`). */
  def windowRollingRows(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        round(sum(col("value").cast("decimal(38,8)")).over(w).cast("double"), 2).as("roll_sum"),
        count(lit(1)).over(w).as("roll_n"))
      .orderBy("event_id")
  }

  val windowRollingRowsSql: String =
    """SELECT event_id, user_id,
      | round(CAST(sum(CAST(value AS DECIMAL(38,8))) OVER w AS DOUBLE), 2) AS roll_sum,
      | count(*) OVER w AS roll_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Rolling correlation (pandas `rolling(20).corr(other)`) from exact
    * co-moment sums over a 20-row trailing frame; second series is the
    * deterministic `event_id % 97`. Determinism recipe: correlation is
    * scale-invariant, and `value` is a 2-decimal fixture, so cents
    * xc = round(100·value) are EXACT BIGINTs and all five frame sums
    * (Σxc, Σy, Σxc·y, Σxc², Σy²) accumulate in plain 64-bit integer
    * arithmetic — the x-scale factors cancel between numerator and
    * √denominator, so the integer moments feed the standard formula
    * unscaled. Replaces the previous five DECIMAL(38,8) window sums
    * (the suite's most expensive projection, 2.8 s in BENCH_r08): long
    * sums codegen to primitive adds. Every operand entering a double
    * (num, denx, deny) is < 2^53 at any corpus size (frame-bounded:
    * |Σxc²| ≤ 20·(100·491)² < 5·10¹⁰), so the int→double conversions
    * are exact and the one final IEEE formula is engine-identical.
    * pandas default `min_periods = window`: partial frames emit null;
    * zero-variance frames (guarded, not divided — ANSI mode) emit null.
    */
  /** pandas `rolling(20).mean()/.std()` over each user's event values:
    * the same exact scaled-integer co-moment discipline as
    * [[windowRollingCorr]] — cents-scaled values sum exactly in 64-bit
    * inside the frame, sample std assembles from n·Σx² − (Σx)² in one
    * double formula (scale divides back out), so the windowed column is
    * hash-portable where a naive stddev_samp() OVER w accumulates
    * doubles in engine-specific frame order. The mean is emitted
    * UNROUNDED (integer ÷ integer·100 — identical IEEE operands both
    * engines; a round() could flip on exact decimal midpoints, which an
    * integer-sum quotient CAN hit), the std rounded (a sqrt output
    * never lands on a decimal midpoint).
    */
  def windowRollingStd(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val xc = round(col("value") * 100).cast("long")
    val n = count(lit(1)).over(w)
    val sx = sum(xc).over(w)
    val sxx = sum(xc * xc).over(w)
    val varNum = n * sxx - sx * sx
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        when(n === 20,
          sx.cast("double") / (n.cast("double") * lit(100.0))).as("roll_mean"),
        when(n === 20 && varNum > 0,
          round(sqrt(varNum.cast("double") /
            (n.cast("double") * (n - lit(1)).cast("double"))) / lit(100.0), 4))
          .as("roll_std"))
      .orderByOnce("event_id")
  }

  val windowRollingStdSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    count(*) OVER w AS cnt,
      |    sum(xc) OVER w AS sx,
      |    sum(xc * xc) OVER w AS sxx
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  CASE WHEN cnt = 20
      |       THEN CAST(sx AS DOUBLE) / (CAST(cnt AS DOUBLE) * 100.0) END AS roll_mean,
      |  CASE WHEN cnt = 20 AND cnt * sxx - sx * sx > 0
      |       THEN round(sqrt(CAST(cnt * sxx - sx * sx AS DOUBLE) /
      |                       (CAST(cnt AS DOUBLE) * CAST(cnt - 1 AS DOUBLE))) / 100.0, 4) END AS roll_std
      |FROM s ORDER BY event_id""".stripMargin

  def windowRollingCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val xc = round(col("value") * 100).cast("long")
    val y = col("event_id") % 97
    val n = count(lit(1)).over(w)
    val sx = sum(xc).over(w); val sy = sum(y).over(w)
    val sxy = sum(xc * y).over(w)
    val sxx = sum(xc * xc).over(w); val syy = sum(y * y).over(w)
    // exact 64-bit co-moments; scale cancels: corr(100x, y) = corr(x, y)
    val num = n * sxy - sx * sy
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        // + 0.0 folds IEEE -0.0 to +0.0 (Spark's round drops the sign
        // of negative zero, DuckDB's keeps it; identity otherwise)
        when(n === 20 && denx > 0 && deny > 0,
          round(num.cast("double") /
            sqrt(denx.cast("double") * deny.cast("double")), 4) + lit(0.0))
          .as("roll_corr"))
      .orderByOnce("event_id")
  }

  val windowRollingCorrSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    count(*) OVER w AS cnt,
      |    sum(xc) OVER w AS sx,
      |    sum(y) OVER w AS sy,
      |    sum(xc * y) OVER w AS sxy,
      |    sum(xc * xc) OVER w AS sxx,
      |    sum(y * y) OVER w AS syy
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc,
      |          event_id % 97 AS y
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  CASE WHEN cnt = 20 AND cnt * sxx - sx * sx > 0 AND cnt * syy - sy * sy > 0
      |       THEN round(CAST(cnt * sxy - sx * sy AS DOUBLE) /
      |                  sqrt(CAST(cnt * sxx - sx * sx AS DOUBLE) * CAST(cnt * syy - sy * sy AS DOUBLE)), 4) + 0.0 END AS roll_corr
      |FROM s ORDER BY event_id""".stripMargin

  /** pandas `drop_duplicates(keep='last')` — the mirror of
    * [[dedupKeepFirst]]: latest event per (user, type) under the SAME
    * ascending total order with the rank taken descending (flipping
    * the rank, not the order, keeps the sort identical to keep-first
    * so a bucketed/sorted layout serves both). Same WindowGroupLimit
    * plan.
    */
  def dedupKeepLast(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(spark, sfDir).events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        fmtTs(col("ts")).as("last_ts"))
      .orderBy("user_id", "event_type")
  }

  val dedupKeepLastSql: String =
    """SELECT user_id, event_type, event_id,
      | strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** Time-based rolling window (Dask `rolling("1h")`): inclusive
    * [t-1h, t] range frame over microsecond offsets.
    */
  def windowRollingRange(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, 0)
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        round(sum(col("value").cast("decimal(38,8)")).over(w).cast("double"), 2).as("hour_sum"),
        count(lit(1)).over(w).as("hour_n"))
      .orderBy("event_id")
  }

  val windowRollingRangeSql: String =
    """SELECT event_id, user_id,
      | round(CAST(sum(CAST(value AS DECIMAL(38,8))) OVER w AS DOUBLE), 2) AS hour_sum,
      | count(*) OVER w AS hour_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** shift/diff: lag, lead, and first-difference per user stream. */
  def windowLagDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id"))
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        round(lag(col("value"), 1).over(w), 2).as("prev_value"),
        round(lead(col("value"), 1).over(w), 2).as("next_value"),
        round(col("value") - lag(col("value"), 1).over(w), 6).as("diff_value"))
      .orderBy("event_id")
  }

  val windowLagDiffSql: String =
    """SELECT event_id, user_id,
      | round(lag(value, 1) OVER w, 2) AS prev_value,
      | round(lead(value, 1) OVER w, 2) AS next_value,
      | round(value - lag(value, 1) OVER w, 6) AS diff_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** ffill/bfill (pandas fillna(method=...)): forward- and backward-fill
    * synthesized nulls (value < 0.2 masked out) within each user's
    * ordered stream — running `last(.., ignoreNulls)` over the past,
    * `first(.., ignoreNulls)` over the future; one shuffle, two sorts.
    */
  def windowFillDirectional(spark: SparkSession, sfDir: String): DataFrame = {
    val past = byUser.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = byUser.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = when(col("value") >= 0.2, col("value"))
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        round(v, 4).as("masked"),
        round(last(v, ignoreNulls = true).over(past), 4).as("ffill"),
        round(first(v, ignoreNulls = true).over(future), 4).as("bfill"))
      .orderBy("event_id")
  }

  val windowFillDirectionalSql: String =
    """SELECT event_id, user_id,
      | round(v, 4) AS masked,
      | round(last_value(v IGNORE NULLS) OVER wpast, 4) AS ffill,
      | round(first_value(v IGNORE NULLS) OVER wfut, 4) AS bfill
      |FROM (SELECT *, CASE WHEN value >= 0.2 THEN value END AS v FROM events)
      |WINDOW
      | wpast AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      | wfut AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |ORDER BY event_id""".stripMargin

  /** Rolling median + IQR over a 7-row frame (pandas
    * `rolling(7).median()` / `.quantile(.25/.75)`): Spark's exact
    * `percentile` runs as a window aggregate over the frame; DuckDB's
    * `quantile_cont` over the identical frame uses the same linear
    * interpolation, so results hash-match without a custom kernel. The
    * frame is tiny (7 rows) and per-user, so the per-row re-aggregation
    * cost is bounded and the whole query is still one exchange + one
    * sort.
    */
  def windowRollingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-6, 0)
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        round(percentile(col("value"), lit(0.5)).over(w), 4).as("roll_median"),
        round(percentile(col("value"), lit(0.25)).over(w), 4).as("roll_q1"),
        round(percentile(col("value"), lit(0.75)).over(w), 4).as("roll_q3"))
      .orderByOnce("event_id")
  }

  val windowRollingMedianSql: String =
    """SELECT event_id, user_id,
      | round(quantile_cont(value, 0.5) OVER w, 4) AS roll_median,
      | round(quantile_cont(value, 0.25) OVER w, 4) AS roll_q1,
      | round(quantile_cont(value, 0.75) OVER w, 4) AS roll_q3
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Linear interpolation of masked values (pandas
    * `interpolate(method='linear')` positional form and
    * `method='time'` form side by side): every 4th event's value is
    * masked deterministically, then reconstructed from the nearest
    * non-null neighbors on both sides — positionally weighted for
    * `interp_pos`, microsecond-timestamp weighted for `interp_time`.
    * Leading/trailing nulls (no neighbor on one side) stay null, the
    * same edge rule both engines can express. All weights derive from
    * exact integers (row numbers / epoch micros), so the double math is
    * bit-identical cross-engine before the final round.
    */
  def windowInterpolate(spark: SparkSession, sfDir: String): DataFrame = {
    val order = byUser.orderBy(col("ts"), col("event_id"))
    val past = order.rowsBetween(Window.unboundedPreceding, -1)
    val future = order.rowsBetween(1, Window.unboundedFollowing)
    val v = when(col("event_id") % 4 =!= 0, col("value"))
    val stamped = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("ts"), v.as("v"),
        row_number().over(order).as("rn"),
        unix_micros(col("ts")).as("us"))
    val nbrs = stamped.select(
      col("event_id"), col("user_id"), col("v"), col("rn"), col("us"),
      last(col("v"), ignoreNulls = true).over(past).as("pv"),
      last(when(col("v").isNotNull, col("rn")), ignoreNulls = true).over(past).as("prn"),
      last(when(col("v").isNotNull, col("us")), ignoreNulls = true).over(past).as("pus"),
      first(col("v"), ignoreNulls = true).over(future).as("nv"),
      first(when(col("v").isNotNull, col("rn")), ignoreNulls = true).over(future).as("nrn"),
      first(when(col("v").isNotNull, col("us")), ignoreNulls = true).over(future).as("nus"))
    nbrs.select(
      col("event_id"), col("user_id"), round(col("v"), 4).as("masked"),
      round(coalesce(col("v"),
        col("pv") + (col("nv") - col("pv"))
          * (col("rn") - col("prn")).cast("double")
          / (col("nrn") - col("prn")).cast("double")), 4).as("interp_pos"),
      round(coalesce(col("v"),
        col("pv") + (col("nv") - col("pv"))
          * (col("us") - col("pus")).cast("double")
          / (col("nus") - col("pus")).cast("double")), 4).as("interp_time"))
      .orderByOnce("event_id")
  }

  val windowInterpolateSql: String =
    """WITH stamped AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN event_id % 4 <> 0 THEN value END AS v,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    epoch_us(ts) AS us
      |  FROM events),
      |nbrs AS (
      |  SELECT event_id, user_id, v, rn, us,
      |    last_value(v IGNORE NULLS) OVER wpast AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wpast AS prn,
      |    last_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS) OVER wpast AS pus,
      |    first_value(v IGNORE NULLS) OVER wfut AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wfut AS nrn,
      |    first_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS) OVER wfut AS nus
      |  FROM stamped
      |  WINDOW
      |    wpast AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    wfut AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |SELECT event_id, user_id, round(v, 4) AS masked,
      |  round(coalesce(v, pv + (nv - pv) * CAST(rn - prn AS DOUBLE) / CAST(nrn - prn AS DOUBLE)), 4) AS interp_pos,
      |  round(coalesce(v, pv + (nv - pv) * CAST(us - pus AS DOUBLE) / CAST(nus - pus AS DOUBLE)), 4) AS interp_time
      |FROM nbrs ORDER BY event_id""".stripMargin

  /** Cumulative sum / max / count (Dask cumsum/cummax/cumcount). */
  def windowCumulative(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        round(sum(col("value").cast("decimal(38,8)")).over(w).cast("double"), 2).as("cum_sum"),
        max(col("value")).over(w).as("cum_max"),
        count(lit(1)).over(w).as("cum_n"))
      .orderByOnce("event_id")
  }

  val windowCumulativeSql: String =
    """SELECT event_id, user_id,
      | round(CAST(sum(CAST(value AS DECIMAL(38,8))) OVER w AS DOUBLE), 2) AS cum_sum,
      | max(value) OVER w AS cum_max,
      | count(*) OVER w AS cum_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** pandas `pct_change()`: relative change vs the previous row in each
    * user's ordered stream. Emitted UNROUNDED: both engines compute the
    * identical IEEE (value - lag)/lag on identical doubles, so the
    * quotient is bit-equal — while round() at a fixed scale is the
    * operation whose half-way rule differs between engines (§4.2).
    */
  def windowPctChange(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id"))
    val prev = lag(col("value"), 1).over(w)
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("value"),
        round(prev, 2).as("prev_value"),
        // zero previous value -> NULL (pandas emits inf; NULL is the
        // SQL-portable analogue, and ANSI Spark errors on a bare /0)
        when(prev =!= 0.0, (col("value") - prev) / prev).as("pct_change"))
      .orderBy("event_id")
  }

  val windowPctChangeSql: String =
    """SELECT event_id, user_id,
      | round(value, 2) AS value,
      | round(lag(value, 1) OVER w, 2) AS prev_value,
      | CASE WHEN lag(value, 1) OVER w <> 0
      |   THEN (value - lag(value, 1) OVER w) / lag(value, 1) OVER w END AS pct_change
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** pandas `expanding().mean()/max()`: running statistics over the
    * full history of each user's stream. The mean divides an EXACT
    * decimal running sum by the running count in one double division —
    * a plain avg() window would accumulate doubles in engine-specific
    * frame order (DuckDB segment-trees long frames; Spark scans).
    */
  def windowExpanding(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The running sum emits via the scaled-BIGINT form (util.dsumExact
    // pattern): a bare decimal→double cast double-rounds differently in
    // DuckDB (int128 path) once the sum crosses 2^53, so route through
    // decimal(38,4) → ×10^4 → BIGINT → double, then one IEEE division by
    // the running count. Deterministic at any per-partition magnitude
    // that fits decimal(38,4)·10^4 in a BIGINT (~9·10^14).
    val runSum = sum(col("value").cast("decimal(38,8)")).over(w)
    val f = 10000L
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        ((runSum.cast("decimal(38,4)") * lit(f)).cast("long").cast("double") /
          lit(f.toDouble) / count(lit(1)).over(w)).as("exp_mean"),
        max(col("value")).over(w).as("exp_max"),
        count(lit(1)).over(w).as("exp_n"))
      .orderBy("event_id")
  }

  val windowExpandingSql: String =
    """SELECT event_id, user_id,
      | CAST(CAST(CAST(sum(CAST(value AS DECIMAL(38,8))) OVER w AS DECIMAL(38,4)) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 / count(*) OVER w AS exp_mean,
      | max(value) OVER w AS exp_max,
      | count(*) OVER w AS exp_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Ranking / top-N per group: top-3 orders per customer by price.
    * Catalyst plans the rank filter as WindowGroupLimit, pushing the
    * top-k below the full sort.
    */
  def windowRankTopn(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, sfDir).orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  val windowRankTopnSql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Rank-method family (pandas rank(method=...) / qcut): rank,
    * dense_rank, percent_rank, and quartile binning (ntile) over one
    * deterministic per-group order — the tie-handling variants the
    * plain row_number top-N doesn't exercise.
    */
  def windowRankMethods(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, sfDir).orders
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderpriority"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_orderpriority", "rnk", "o_orderkey")
  }

  val windowRankMethodsSql: String =
    """SELECT o_orderpriority, o_orderkey,
      | rank() OVER w AS rnk,
      | dense_rank() OVER w AS drnk,
      | round(percent_rank() OVER w, 6) AS prnk,
      | ntile(4) OVER w AS quartile
      |FROM orders
      |WHERE o_orderkey <= 2000
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin

  /** Ordered dedup: keep the earliest event per (user, event_type). */
  def dedupKeepFirst(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, sfDir).events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        fmtTs(col("ts")).as("first_ts"))
      .orderBy("user_id", "event_type")
  }

  val dedupKeepFirstSql: String =
    """SELECT user_id, event_type, event_id,
      | strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** resample("1D"): tumbling daily buckets (batch form; streaming twin
    * uses groupBy(window($"ts", "1 day")) — graft.streaming).
    */
  def tsTumblingDay(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .groupBy(fmtDay(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
      .orderBy("day", "event_type")

  val tsTumblingDaySql: String =
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       | count(*) AS n, ${dsumSql("value", 2)} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** pandas `resample('M')`: calendar-month tumbling buckets — the most
    * common resample frequency after 'D'. Runs over orders (1995–2001,
    * so the bucket stream crosses six YEAR boundaries — the Dec→Jan
    * rollover is where hand-rolled month arithmetic breaks; both
    * engines' `date_trunc('month', …)` must agree). Same partial+final
    * one-shuffle aggregate shape as the daily form.
    */
  def tsTumblingMonth(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .groupBy(fmtDay(date_trunc("month", col("o_orderdate"))).as("month_start"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsumExact(col("o_totalprice"), 2).as("sum_price"))
      .orderBy("month_start", "o_orderstatus")

  val tsTumblingMonthSql: String =
    s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       | o_orderstatus, count(*) AS n,
       | ${dsumExactSql("o_totalprice", 2)} AS sum_price
       |FROM orders GROUP BY 1, 2 ORDER BY month_start, o_orderstatus""".stripMargin

  /** pandas `resample('W-MON')`: week-anchored tumbling buckets. Both
    * engines' `date_trunc('week', …)` snap to the preceding MONDAY, so
    * the anchor is portable; the year-boundary weeks (a late-December
    * Monday's bucket swallowing the first days of January) are the
    * parity trap this query exists to pin.
    */
  def tsTumblingWeek(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .groupBy(fmtDay(date_trunc("week", col("o_orderdate"))).as("week_start"))
      .agg(count(lit(1)).as("n"), dsumExact(col("o_totalprice"), 2).as("sum_price"))
      .orderBy("week_start")

  val tsTumblingWeekSql: String =
    s"""SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
       | count(*) AS n, ${dsumExactSql("o_totalprice", 2)} AS sum_price
       |FROM orders GROUP BY 1 ORDER BY week_start""".stripMargin

  /** pandas `resample('D').asfreq()` / `reindex` UPSAMPLING: project
    * each user's sparse daily series onto the complete daily grid
    * spanning their [first, last] active day (`sequence` + explode —
    * the generator never materializes on the driver), then gap-fill two
    * ways side by side: forward-carry (`asfreq` + `ffill`) and linear
    * interpolation between the surrounding known days. Grid size is
    * bounded by users × span-days and partitions by user like every
    * other window query; weights derive from exact integer day
    * differences, so the double math is bit-identical cross-engine
    * before the final round (same recipe as `window_interpolate`).
    * Endpoints always carry values (the grid spans min..max of OBSERVED
    * days), so interior gaps always have both neighbors.
    */
  def tsResampleUpsample(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables(spark, sfDir).events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(dsum(col("value"), 2).as("v"))
    val grid = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val order = Window.partitionBy("user_id").orderBy("day")
    val past = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("v"),
        last(col("v"), ignoreNulls = true).over(past).as("pv"),
        last(when(col("v").isNotNull, col("day")), ignoreNulls = true)
          .over(past).as("pd"),
        first(col("v"), ignoreNulls = true).over(future).as("nv"),
        first(when(col("v").isNotNull, col("day")), ignoreNulls = true)
          .over(future).as("nd"))
    filled.select(col("user_id"), fmtDay(col("day")).as("day"), col("v"),
        col("pv").as("v_ffill"),
        round(coalesce(col("v"),
          col("pv") + (col("nv") - col("pv"))
            * datediff(col("day"), col("pd")).cast("double")
            / datediff(col("nd"), col("pd")).cast("double")), 4).as("v_interp"))
      .orderBy("user_id", "day")
  }

  val tsResampleUpsampleSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, ${dsumSql("value", 2)} AS v
       |  FROM events GROUP BY 1, 2),
       |grid AS (
       |  SELECT user_id,
       |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1)),
       |filled AS (
       |  SELECT g.user_id, g.day, d.v,
       |    last_value(d.v IGNORE NULLS) OVER wpast AS pv,
       |    last_value(CASE WHEN d.v IS NOT NULL THEN g.day END IGNORE NULLS) OVER wpast AS pd,
       |    first_value(d.v IGNORE NULLS) OVER wfut AS nv,
       |    first_value(CASE WHEN d.v IS NOT NULL THEN g.day END IGNORE NULLS) OVER wfut AS nd
       |  FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
       |  WINDOW
       |    wpast AS (PARTITION BY g.user_id ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    wfut AS (PARTITION BY g.user_id ORDER BY g.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, v, pv AS v_ffill,
       |  round(coalesce(v, pv + (nv - pv) * CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)), 4) AS v_interp
       |FROM filled ORDER BY user_id, day""".stripMargin

  /** groupby().transform equivalent: broadcast a group aggregate back
    * onto every row (here: de-meaned quantity per returnflag) via an
    * unbounded window — one shuffle, no join back.
    */
  def windowGroupTransform(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
    val groupAvg = sum(col("l_quantity").cast("decimal(38,8)")).over(w).cast("double") /
      count(lit(1)).over(w)
    Tables(spark, sfDir).lineitem
      .filter(col("l_orderkey") <= 500)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        round(groupAvg, 6).as("group_avg"),
        round(col("l_quantity") - groupAvg, 6).as("demeaned"))
      // NOTE: (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // fixture — the full output column list makes the order total
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "demeaned")
  }

  val windowGroupTransformSql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      | round(ga, 6) AS group_avg, round(l_quantity - ga, 6) AS demeaned
      |FROM (
      |  SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
      |   CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) OVER w AS DOUBLE) / count(*) OVER w AS ga
      |  FROM lineitem WHERE l_orderkey <= 500
      |  WINDOW w AS (PARTITION BY l_returnflag))
      |ORDER BY l_orderkey, l_linenumber, l_returnflag, demeaned""".stripMargin

  /** first_value / last_value / nth_value over an explicit full-group
    * frame (the frame matters: last_value over the default frame is a
    * classic wrong-answer trap — it sees only rows up to CURRENT ROW).
    */
  def windowFirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        first(col("event_id")).over(w).as("first_ev"),
        last(col("event_id")).over(w).as("last_ev"),
        nth_value(col("event_id"), 2).over(w).as("second_ev"))
      .orderBy("event_id")
  }

  val windowFirstLastSql: String =
    """SELECT event_id, user_id,
      | first_value(event_id) OVER w AS first_ev,
      | last_value(event_id) OVER w AS last_ev,
      | nth_value(event_id, 2) OVER w AS second_ev
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY event_id""".stripMargin

  /** Sliding windows in batch (1-hour window, 15-minute slide): each
    * event lands in exactly 4 epoch-aligned windows. Streaming twin:
    * graft.streaming.Streams.slidingHourly. Window starts are emitted
    * as epoch seconds — timezone-proof for the oracle compare.
    */
  def tsSlidingHour(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
      .select(col("window.start").cast("long").as("w_start"), col("n"), col("sum_value"))
      .orderBy("w_start")

  val tsSlidingHourSql: String =
    s"""SELECT ws AS w_start, count(*) AS n, ${dsumSql("value", 2)} AS sum_value
       |FROM (
       |  SELECT (epoch_us(ts) // 900000000 - i) * 900 AS ws, value
       |  FROM events, generate_series(0, 3) AS t(i))
       |GROUP BY ws ORDER BY w_start""".stripMargin

  /** Gap-based sessionization (30-min inactivity closes a session), then
    * per-session rollup. See [[graft.operators.Sessionize]].
    */
  def tsSessionizeGap30m(spark: SparkSession, sfDir: String): DataFrame = {
    val sessions = Sessionize.withSessionId(
      Tables(spark, sfDir).events, ts = "ts", by = Seq("user_id"), gapSeconds = 1800)
    sessions.groupBy("user_id", "session_id")
      .agg(
        fmtTs(min(col("ts"))).as("session_start"),
        fmtTs(max(col("ts"))).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value"), 2).as("sum_value"))
      .orderByOnce("user_id", "session_id")
  }

  /** [[tsSessionizeGap30m]] through the hot-key time-range-split path
    * ([[graft.operators.Sessionize.withSessionIdSplit]], 6-hour ranges
    * with boundary-session merge) — same oracle, so the driver gate pins
    * the split's equivalence at sf0.01 on top of HotKeySplitSpec.
    */
  def tsSessionizeSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val sessions = Sessionize.withSessionIdSplit(
      Tables(spark, sfDir).events, ts = "ts", by = Seq("user_id"),
      gapSeconds = 1800, splitSeconds = 21600L)
    sessions.groupBy("user_id", "session_id")
      .agg(
        fmtTs(min(col("ts"))).as("session_start"),
        fmtTs(max(col("ts"))).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value"), 2).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  val tsSessionizeGap30mSql: String =
    s"""SELECT user_id, session_id,
       | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       | strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       | count(*) AS n_events, ${dsumSql("value", 2)} AS sum_value
       |FROM (
       |  SELECT user_id, ts, value,
       |   CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM (
       |    SELECT user_id, ts, value,
       |     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       |          OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
       |          THEN 1 ELSE 0 END AS new_session
       |    FROM events))
       |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // declared after tsSessionizeGap30mSql: object vals initialize in order
  val tsSessionizeSplitSql: String = tsSessionizeGap30mSql

  /** Exponentially weighted mean per user (pandas `ewm(alpha).mean()`,
    * adjust=true): ewm_t = Σ_i (1-α)^(t-i)·x_i / Σ_i (1-α)^(t-i) over
    * the user's ts-ordered stream.
    *
    * The recursion is re-expressed as two running prefix sums so it
    * stays a plain codegen'd Window over ONE shuffle-sort (no UDAF, no
    * mapGroups): with w_i = (1-α)^(-i), ewm_t = Σ w_i·x_i / Σ w_i — the
    * (1-α)^t renormalization cancels in the ratio. Both running sums
    * accumulate in frame order, which the ORDER BY pins, so the oracle
    * adds bit-identically. Range bound: w_i grows as (1-α)^(-i) and
    * overflows double past i ≈ 708/-ln(1-α) (~6.7k rows/key at α=0.1);
    * events tops out at ~90 rows/key/sf — for genuinely longer streams,
    * re-zero the exponent per coarse time bucket and carry one
    * renormalized pair across buckets, exactly the AsofJoin/Sessionize
    * hot-key split pattern.
    */
  def windowEwm(spark: SparkSession, sfDir: String): DataFrame = {
    val alpha = 0.1
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, sfDir).events
      .withColumn("__w",
        pow(lit(1.0 - alpha), -(row_number().over(order) - 1).cast("double")))
      .withColumn("ewm",
        round(sum(col("value") * col("__w")).over(run) / sum(col("__w")).over(run), 4))
      .select(col("event_id"), col("user_id"), round(col("value"), 4).as("value"),
        col("ewm"))
      .orderByOnce("event_id")
  }

  /** [[windowEwm]] via the two-pass affine-carry scan
    * ([[graft.operators.Ewm]]) — the unbounded-stream-length scale path
    * (the prefix-sum window overflows past ~6.7k rows/key at α=0.1).
    * Same oracle as windowEwm: identical results is the contract.
    */
  def windowEwmScan(spark: SparkSession, sfDir: String): DataFrame =
    Ewm.withEwm(Tables(spark, sfDir).events, Seq("user_id"),
        Seq("ts", "event_id"), "value", alpha = 0.1)
      .select(col("event_id"), col("user_id"),
        round(col("value"), 4).as("value"), round(col("ewm"), 4).as("ewm"))
      .orderByOnce("event_id")

  val windowEwmSql: String =
    """WITH t AS (
      | SELECT event_id, user_id, ts, value,
      |  power(0.9, -CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS DOUBLE)) AS w
      | FROM events)
      |SELECT event_id, user_id, round(value, 4) AS value,
      | round(sum(value * w) OVER win / sum(w) OVER win, 4) AS ewm
      |FROM t
      |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // scan variant contract: IDENTICAL results to the window phrasing
  val windowEwmScanSql: String = windowEwmSql

  /** pandas `rolling(4, win_type=...)` linearly-weighted moving average
    * (WMA): weights 4,3,2,1 newest→oldest over a 4-row trailing frame.
    * Phrased as FOUR LAG TERMS instead of a collect_list+HOF fold —
    * lags over one shared (user, ts, event_id) sort stay inside
    * whole-stage codegen and add ZERO shuffles beyond the one keyed
    * exchange every per-user window pays. Exactness: `value` is a
    * 2-decimal fixture, so cents = round(100·value) are exact BIGINTs,
    * the weighted numerator is 64-bit integer arithmetic (≤ 10·49 100
    * per row — scale-independent), and the emitted wma is ONE double
    * division num/(10·100) with identical operands in both engines
    * (unrounded — an integer-quotient CAN land on decimal midpoints
    * where round() flips; the raw quotient is hash-stable).
    * pandas `min_periods = window`: partial frames emit null.
    */
  def windowRollingWma(spark: SparkSession, sfDir: String): DataFrame = {
    val o = byUser.orderBy(col("ts"), col("event_id"))
    val xc = round(col("value") * 100).cast("long")
    val num = xc * 4 + lag(xc, 1).over(o) * 3 +
      lag(xc, 2).over(o) * 2 + lag(xc, 3).over(o)
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        (num.cast("double") / lit(1000.0)).as("wma"))
      .orderBy("event_id")
  }

  val windowRollingWmaSql: String =
    """WITH t AS (
      |  SELECT event_id, user_id, ts,
      |    CAST(round(value * 100) AS BIGINT) AS xc
      |  FROM events),
      |s AS (
      |  SELECT event_id, user_id,
      |    xc * 4 + lag(xc, 1) OVER w * 3 + lag(xc, 2) OVER w * 2
      |      + lag(xc, 3) OVER w AS num
      |  FROM t
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_id, user_id, CAST(num AS DOUBLE) / 1000.0 AS wma
      |FROM s ORDER BY event_id""".stripMargin

  /** Time-weighted average (the step-function/TWAP read of an
    * irregular series — pandas has no built-in; the standard
    * observation-carried-forward integral): each observation's value
    * holds until the user's NEXT observation, so
    * twap = Σ valueᵢ·(tsᵢ₊₁ − tsᵢ) / (ts_last − ts_first) per user —
    * the mean a regular resample would converge to, without
    * materializing upsampled rows (the at-scale point: an upsample to
    * seconds is 10⁵× the rows; the lead() phrasing is one window pass
    * over the observations themselves). Exactness: durations are exact
    * µs BIGINTs off one lead(); value cents are exact BIGINTs; the
    * numerator Σ cents·dur ≤ 49 100 · user-span-µs < 2⁶³ for any
    * per-user span under ~59 years (corpus size never enters — the
    * bound is per user); one final double division. Ties on ts get
    * duration 0 for all but the last peer (order pinned by event_id),
    * so tied-observation arbitration cannot move mass. Single-event
    * users have no span and emit nothing.
    */
  def tsTimeWeightedAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val o = byUser.orderBy(col("ts"), col("event_id"))
    val t = Tables(spark, sfDir).events
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("xc"))
      .withColumn("mu", unix_micros(col("ts")))
      .withColumn("dur", lead(col("mu"), 1).over(o) - col("mu"))
    t.filter(col("dur").isNotNull)
      .groupBy("user_id")
      .agg(sum(col("xc") * col("dur")).as("num"), sum(col("dur")).as("den"))
      .filter(col("den") > 0)
      .select(col("user_id"),
        (col("num").cast("double") / (col("den") * 100).cast("double"))
          .as("twap"))
      .orderBy("user_id")
  }

  val tsTimeWeightedAvgSql: String =
    """WITH t AS (
      |  SELECT user_id,
      |    CAST(round(value * 100) AS BIGINT) AS xc,
      |    epoch_us(ts) AS mu,
      |    lead(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts) AS dur
      |  FROM events),
      |s AS (
      |  SELECT user_id, sum(xc * dur) AS num, sum(dur) AS den
      |  FROM t WHERE dur IS NOT NULL
      |  GROUP BY 1 HAVING sum(dur) > 0)
      |SELECT user_id, CAST(num AS DOUBLE) / CAST(den * 100 AS DOUBLE) AS twap
      |FROM s ORDER BY user_id""".stripMargin

  /** pandas `rolling(20).min()/.max()` — the remaining members of the
    * rolling family: pure SELECTIONS over the frame (no arithmetic, no
    * rounding discipline), both riding the ONE shared per-user window
    * pass with the other frame aggregates. Spark's WindowExec evaluates
    * a rows-frame min/max by scanning the 20-row frame per row — at a
    * monotonic-deque O(1)/row this family would be cheaper still, but
    * the frame is constant-size so the factor is a fixed 20×, not a
    * scale term. Partial windows emit null (pandas min_periods parity).
    */
  def windowRollingMinmax(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val n = count(lit(1)).over(w)
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        when(n === 20, min(col("value")).over(w)).as("roll_min"),
        when(n === 20, max(col("value")).over(w)).as("roll_max"))
      .orderBy("event_id")
  }

  val windowRollingMinmaxSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    count(*) OVER w AS cnt,
      |    min(value) OVER w AS mn,
      |    max(value) OVER w AS mx
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  CASE WHEN cnt = 20 THEN mn END AS roll_min,
      |  CASE WHEN cnt = 20 THEN mx END AS roll_max
      |FROM s ORDER BY event_id""".stripMargin

  /** WIDE-frame rolling min/max (rolling(64), r17 verdict #6) on the
    * monotonic-deque kernel ([[graft.operators.RollingDeque]]): at
    * frame 64 WindowExec's per-row frame rescan is a genuine 64×
    * term, the deque's O(1)/row is not — Stress's frame-width curve
    * records the crossover. Declared with the WINDOW formulation as its
    * oracle (same device as `window_ewm_var_auto`: the faster engine
    * phrasing is gated by the declarative semantics it must equal), so
    * the hash gate re-proves deque ≡ window cross-engine every round;
    * Round18Spec additionally pins the equality Spark-side with planted
    * nulls, ties, and multi-partition keys at several frame widths.
    */
  def windowRollingMinmaxWide(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.RollingDeque.withRollingMinMax(
      Tables(spark, sfDir).events
        .select(col("event_id"), col("user_id"), col("ts"), col("value")),
      Seq("user_id"), Seq("ts", "event_id"), "value", frame = 64)
      .select(col("event_id"), col("user_id"), col("roll_min"), col("roll_max"))
      .orderBy("event_id")

  val windowRollingMinmaxWideSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    count(*) OVER w AS cnt,
      |    min(value) OVER w AS mn,
      |    max(value) OVER w AS mx
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 63 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  CASE WHEN cnt = 64 THEN mn END AS roll_min,
      |  CASE WHEN cnt = 64 THEN mx END AS roll_max
      |FROM s ORDER BY event_id""".stripMargin

  /** Rolling sample skewness (pandas `rolling(20).skew()`), the third
    * member of the exact scaled-integer co-moment family
    * ([[windowRollingStd]] / [[windowRollingCorr]]): with cent-integer
    * xᵢ and raw window sums S1=Σx, S2=Σx², S3=Σx³,
    * `num = n²S3 − 3nS1S2 + 2S1³ = n²·Σ(x−μ)³` and
    * `den = nS2 − S1² = n·Σ(x−μ)²` are EXACT BIGINTs, so
    * g1 = m3/m2^{3/2} = num/den^{3/2} and the pandas bias correction
    * √(n(n−1))/(n−2) enter floating point only through one identical
    * operation sequence in both engines. Overflow headroom: the
    * mean-centering constraint Σ(x−μ)=0 caps |Σ(x−μ)³| near R³ (one
    * point can sit R from μ only if the other 19 cancel it), so
    * |num| ≤ n²·R³ ≈ 400·(56021)³ < 1.5e18 and every partial term
    * (3nS1S2 ≤ 4.3e18) stays inside int64 for this fixture's R
    * (values in [0, 560.21] — a domain past ~R=61k cents must ride
    * DECIMAL(38,0) sums instead, exactly as [[windowRollingKurt]]'s
    * quartic already does; DuckDB's HUGEINT widens implicitly, so a
    * silent Spark-side wrap would surface as an oracle hash FAIL, not
    * a wrong-but-matching answer). Windows shorter than 20 rows and
    * zero-variance windows emit null (pandas parity).
    */
  def windowRollingSkew(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val xc = round(col("value") * 100).cast("long")
    val n = count(lit(1)).over(w)
    val s1 = sum(xc).over(w)
    val s2 = sum(xc * xc).over(w)
    val s3 = sum(xc * xc * xc).over(w)
    val num = n * n * s3 - lit(3L) * n * s1 * s2 + lit(2L) * s1 * s1 * s1
    val den = n * s2 - s1 * s1
    val dd = den.cast("double")
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        when(n === 20 && den > 0,
          round(num.cast("double") / (dd * sqrt(dd)) *
            sqrt(lit(380.0)) / lit(18.0), 4) + lit(0.0))
          .as("roll_skew"))
      .orderByOnce("event_id")
  }

  val windowRollingSkewSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    count(*) OVER w AS cnt,
      |    sum(xc) OVER w AS s1,
      |    sum(xc * xc) OVER w AS s2,
      |    sum(xc * xc * xc) OVER w AS s3
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  CASE WHEN cnt = 20 AND cnt * s2 - s1 * s1 > 0
      |       THEN round(CAST(cnt * cnt * s3 - 3 * cnt * s1 * s2 + 2 * s1 * s1 * s1 AS DOUBLE)
      |                  / (CAST(cnt * s2 - s1 * s1 AS DOUBLE) * sqrt(CAST(cnt * s2 - s1 * s1 AS DOUBLE)))
      |                  * sqrt(380.0) / 18.0, 4) + 0.0 END AS roll_skew
      |FROM s ORDER BY event_id""".stripMargin

  /** Rolling sample excess kurtosis (pandas `rolling(20).kurt()`) — the
    * fourth and last member of the exact co-moment family
    * ([[windowRollingStd]] / [[windowRollingCorr]] /
    * [[windowRollingSkew]]). Same discipline: cent-integer xᵢ, raw
    * window sums S1..S4, central moments as exact integers
    * `D2 = nS2 − S1² = n·Σ(x−μ)²` and
    * `D4 = n⁴S4 − 4n³S1S3 + 6n²S1²S2 − 3nS1⁴ = n⁴·Σ(x−μ)⁴`, then the
    * pandas bias-corrected estimator at n=20,
    * `G2 = [n(n+1)(n−1)·D4/(n·D2²) − 3(n−1)²]/((n−2)(n−3))
    *     = (399·D4/(20·D2²) − 1083)/306`,
    * entering floating point through ONE identical operation sequence
    * in both engines.
    *
    * The quartic breaks the skew family's int64 headroom: a single
    * x⁴ at this fixture's R = 56021 cents is 9.8e18 > Long.MaxValue,
    * so S3/S4 and every D4 term ride DECIMAL(38,0) — max term
    * 6n²S1²S2 ≤ 2400·(20R)²·(20R²) ≈ 1.9e29, comfortably inside 38
    * digits (DuckDB's HUGEINT at 1.7e38 likewise). The long-typed
    * factors stay long only where provably safe: 6n²S1² ≤ 3e15,
    * 4n³S1 ≤ 3.6e13. Windows shorter than 20 rows and zero-variance
    * windows emit null (pandas parity). Plan shape: the same
    * 1 scan / 1 exchange / 1 window pass as the rest of the family.
    */
  def windowRollingKurt(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val dec = "decimal(38,0)"
    val xc = round(col("value") * 100).cast("long")
    val x2 = (xc * xc).cast(dec)
    val n = count(lit(1)).over(w)
    val s1 = sum(xc).over(w)
    val s2 = sum(xc * xc).over(w)
    val s3 = sum(x2 * xc.cast(dec)).over(w)
    val s4 = sum(x2 * x2).over(w)
    val d4 = (n * n * n * n).cast(dec) * s4 -
      (lit(4L) * n * n * n * s1).cast(dec) * s3 +
      (lit(6L) * n * n * s1 * s1).cast(dec) * s2.cast(dec) -
      (lit(3L) * n).cast(dec) * s1.cast(dec) * s1.cast(dec) *
        s1.cast(dec) * s1.cast(dec)
    val d2 = n * s2 - s1 * s1
    val dd = d2.cast("double")
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        when(n === 20 && d2 > 0,
          round((lit(399.0) * d4.cast("double") / (lit(20.0) * dd * dd) -
            lit(1083.0)) / lit(306.0), 4) + lit(0.0))
          .as("roll_kurt"))
      .orderByOnce("event_id")
  }

  val windowRollingKurtSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    count(*) OVER w AS cnt,
      |    sum(xc) OVER w AS s1,
      |    sum(xc * xc) OVER w AS s2,
      |    sum(CAST(xc AS HUGEINT) * xc * xc) OVER w AS s3,
      |    sum(CAST(xc AS HUGEINT) * xc * xc * xc) OVER w AS s4
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  CASE WHEN cnt = 20 AND cnt * s2 - s1 * s1 > 0
      |       THEN round((399.0 * CAST(cnt * cnt * cnt * cnt * s4
      |                                - 4 * cnt * cnt * cnt * s1 * s3
      |                                + 6 * cnt * cnt * s1 * s1 * s2
      |                                - 3 * cnt * s1 * s1 * s1 * s1 AS DOUBLE)
      |                   / (20.0 * CAST(cnt * s2 - s1 * s1 AS DOUBLE) * CAST(cnt * s2 - s1 * s1 AS DOUBLE))
      |                   - 1083.0) / 306.0, 4) + 0.0 END AS roll_kurt
      |FROM s ORDER BY event_id""".stripMargin

  /** Per-key lag-1 autocorrelation (pandas `groupby().apply(s.autocorr)`):
    * one lag() pass pairs each observation with its predecessor in
    * (ts, event_id) order, then ONE map-side-combinable aggregate per
    * user carries the six exact co-moment sums — never a self-join of
    * the series against its shift. Same exact-BIGINT discipline as
    * [[windowRollingCorr]]; with cent integers the terms stay inside
    * int64 up to ~50k observations per key (past that the sums ride
    * DECIMAL(38,0) unchanged — DuckDB's HUGEINT does so implicitly).
    * Keys with < 3 pairs or a constant side emit null (pandas parity:
    * autocorr of a constant is NaN).
    */
  def windowAutocorrLag1(spark: SparkSession, sfDir: String): DataFrame = {
    val o = byUser.orderBy(col("ts"), col("event_id"))
    val xc = round(col("value") * 100).cast("long")
    val t = Tables(spark, sfDir).events
      .select(col("user_id"), col("ts"), col("event_id"), xc.as("x"))
      .withColumn("y", lag(col("x"), 1).over(o))
      .filter(col("y").isNotNull)
    val agg = t.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denx = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    agg.select(col("user_id"), col("n").as("n_pairs"),
      when(col("n") >= 3 && denx > 0 && deny > 0,
        round(num.cast("double") /
          sqrt(denx.cast("double") * deny.cast("double")), 4) + lit(0.0))
        .as("autocorr"))
      .orderBy("user_id")
  }

  val windowAutocorrLag1Sql: String =
    """WITH t AS (
      |  SELECT user_id, xc AS x,
      |    lag(xc, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
      |  FROM (SELECT user_id, ts, event_id,
      |          CAST(round(value * 100) AS BIGINT) AS xc
      |        FROM events)),
      |s AS (
      |  SELECT user_id, count(*) AS n,
      |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
      |    sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM t WHERE y IS NOT NULL GROUP BY 1)
      |SELECT user_id, n AS n_pairs,
      |  CASE WHEN n >= 3 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |       THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |                  sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 4) + 0.0
      |  END AS autocorr
      |FROM s ORDER BY user_id""".stripMargin

  /** OHLC resample (pandas `resample('D').ohlc()`): per (event_type,
    * day) the first/last values under the total (ts, event_id) order
    * plus min/max. First/last ride ONE packed struct min/max in the
    * same aggregate as high/low — no ranking window, no second shuffle,
    * map-side combinable (the at-scale point: a row_number() phrasing
    * sorts every group; the struct fold never materializes order).
    * open/high/low/close are SELECTIONS of existing doubles — no
    * arithmetic, so no rounding discipline is needed.
    */
  def tsResampleOhlc(spark: SparkSession, sfDir: String): DataFrame = {
    val key = struct(unix_micros(col("ts")).as("t"), col("event_id").as("e"),
      col("value").as("v"))
    Tables(spark, sfDir).events
      .groupBy(col("event_type"), fmtDay(col("ts")).as("day"))
      .agg(
        min(key).getField("v").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(key).getField("v").as("close"),
        count(lit(1)).as("n"))
      .orderBy("event_type", "day")
  }

  val tsResampleOhlcSql: String =
    """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
      |  (min({'t': epoch_us(ts), 'e': event_id, 'v': value})).v AS open,
      |  max(value) AS high,
      |  min(value) AS low,
      |  (max({'t': epoch_us(ts), 'e': event_id, 'v': value})).v AS close,
      |  count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin

  /** Rolling z-score anomaly gate (the streaming-telemetry "3-sigma"
    * monitor, batch form): each observation scored against ITS OWN
    * trailing 20-row window. Same exact co-moment sums as
    * [[windowRollingStd]]; z = (n·x − S1) / (n·√(den/(n(n−1)))) keeps
    * every operand an exact BIGINT until one identical FP sequence in
    * both engines, and the outlier flag tests the ROUNDED score
    * (|z₄| > 3), so an ulp at the gate cannot flip the boolean in one
    * engine only. Partial windows and zero-variance windows emit null
    * score + null flag (a constant series has no 3-sigma events).
    */
  def windowRollingZscore(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val xc = round(col("value") * 100).cast("long")
    val n = count(lit(1)).over(w)
    val s1 = sum(xc).over(w)
    val s2 = sum(xc * xc).over(w)
    val den = n * s2 - s1 * s1
    val z = round((n * xc - s1).cast("double") /
      (n.cast("double") *
        sqrt(den.cast("double") / (n * (n - lit(1))).cast("double"))), 4) +
      lit(0.0)
    graft.operators.OrderByOnce(Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        when(n === 20 && den > 0, z).as("zscore"),
        // DOUBLE 1.0/0.0, not BOOLEAN: a null boolean round-trips as
        // None via parquet but NaN via DuckDB — a repr mismatch with
        // no information in it; null doubles agree on NaN
        when(n === 20 && den > 0, (abs(z) > lit(3.0)).cast("double"))
          .as("is_outlier")), col("event_id"))
  }

  val windowRollingZscoreSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id, xc,
      |    count(*) OVER w AS cnt,
      |    sum(xc) OVER w AS s1,
      |    sum(xc * xc) OVER w AS s2
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
      |z AS (
      |  SELECT event_id, user_id, cnt, cnt * s2 - s1 * s1 AS den,
      |    round(CAST(cnt * xc - s1 AS DOUBLE) /
      |          (CAST(cnt AS DOUBLE) *
      |           sqrt(CAST(cnt * s2 - s1 * s1 AS DOUBLE) / CAST(cnt * (cnt - 1) AS DOUBLE))), 4) + 0.0 AS zz
      |  FROM s)
      |SELECT event_id, user_id,
      |  CASE WHEN cnt = 20 AND den > 0 THEN zz END AS zscore,
      |  CASE WHEN cnt = 20 AND den > 0 THEN CAST(abs(zz) > 3.0 AS DOUBLE) END AS is_outlier
      |FROM z ORDER BY event_id""".stripMargin

  /** pandas `rolling(20).quantile(0.9, interpolation='lower')` — the
    * ORDER-STATISTIC member of the rolling family ([[windowRollingMedian]]
    * is its q=0.5 case): the 18th smallest of the 20-row frame
    * (index ⌊(n−1)·q⌋ = 17, 0-based — 'lower' keeps the answer an
    * OBSERVED value, so with cent integers both engines agree
    * bit-for-bit with no interpolation arithmetic). Implementation is
    * the rolling-median device at general q: collect the frame,
    * sort 20 elements, index — O(w log w)/row with NO extra shuffle
    * (same single keyed exchange as every rolling query; the frame is
    * constant-size so the factor is fixed, not a scale term). Partial
    * windows emit null (min_periods parity).
    */
  def windowRollingQuantile(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val xc = round(col("value") * 100).cast("long")
    val n = count(lit(1)).over(w)
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        when(n === 20,
          element_at(array_sort(collect_list(xc).over(w)), 18)
            .cast("double") / 100.0)
          .as("roll_p90"))
      .orderByOnce("event_id")
  }

  val windowRollingQuantileSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    count(*) OVER w AS cnt,
      |    list(xc) OVER w AS l
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  CASE WHEN cnt = 20
      |       THEN CAST(list_sort(l)[18] AS DOUBLE) / 100.0 END AS roll_p90
      |FROM s ORDER BY event_id""".stripMargin

  /** Running peak and drawdown per key (pandas `s.cummax() - s` and its
    * running max — the classic series-health curve): `peak` = running
    * max of the cent series, `drawdown` = peak − current, `max_drawdown`
    * = running max of the drawdown. Three unbounded-preceding window
    * aggregates over ONE shared sort — Spark evaluates a cumulative
    * frame in O(1)/row (running-max state, never a frame rescan), so
    * this is a single keyed exchange + one linear pass whatever the
    * series length. All exact cents until the final /100 projection.
    *
    * The drawdown needs the peak INCLUDING the current row (pandas
    * cummax), and max_drawdown the running max of that difference —
    * expressed as max(peak − x) over the same cumulative frame via the
    * algebraic identity max_i(peak_i − x_i) with peak_i itself a
    * running max: a second pass over the SAME window spec, which
    * Catalyst folds into one Window operator (shared partitioning +
    * ordering), keeping the plan at one exchange, one sort.
    */
  def windowDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    val cum = byUser.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val xc = round(col("value") * 100).cast("long")
    val t = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("ts"), xc.as("xc"))
      .withColumn("peak_c", max(col("xc")).over(cum))
      .withColumn("dd_c", col("peak_c") - col("xc"))
    t.withColumn("mdd_c", max(col("dd_c")).over(cum))
      .select(col("event_id"), col("user_id"),
        (col("peak_c").cast("double") / 100.0).as("peak"),
        (col("dd_c").cast("double") / 100.0).as("drawdown"),
        (col("mdd_c").cast("double") / 100.0).as("max_drawdown"))
      .orderBy("event_id")
  }

  val windowDrawdownSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id, ts, xc,
      |    max(xc) OVER w AS peak_c
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |d AS (
      |  SELECT event_id, user_id, xc, peak_c, peak_c - xc AS dd_c,
      |    max(peak_c - xc) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mdd_c
      |  FROM s)
      |SELECT event_id, user_id,
      |  CAST(peak_c AS DOUBLE) / 100.0 AS peak,
      |  CAST(dd_c AS DOUBLE) / 100.0 AS drawdown,
      |  CAST(mdd_c AS DOUBLE) / 100.0 AS max_drawdown
      |FROM d ORDER BY event_id""".stripMargin

  /** pandas `rolling(20).cov(other)` — the unnormalized sibling of
    * [[windowRollingCorr]] over the same (value, event_id % 97) pair
    * and the same shared per-user frame: sample covariance
    * (n·Σxy − ΣxΣy)/(n(n−1)) from exact cents co-moments, descaled by
    * one final /100 (cov(100x, y) = 100·cov(x, y) — unlike corr the
    * scale does NOT cancel, which is why this is its own row). One
    * window, one keyed exchange; n = 20 windows only (min_periods
    * parity).
    */
  def windowRollingCov(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val xc = round(col("value") * 100).cast("long")
    val y = col("event_id") % 97
    val n = count(lit(1)).over(w)
    val sx = sum(xc).over(w); val sy = sum(y).over(w)
    val sxy = sum(xc * y).over(w)
    val num = n * sxy - sx * sy
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        when(n === 20,
          round(num.cast("double") / (n * (n - 1)).cast("double") /
            lit(100.0), 6) + lit(0.0))
          .as("roll_cov"))
      .orderBy("event_id")
  }

  val windowRollingCovSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    count(*) OVER w AS n,
      |    sum(xc) OVER w AS sx,
      |    sum(y) OVER w AS sy,
      |    sum(xc * y) OVER w AS sxy
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc,
      |          event_id % 97 AS y
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  CASE WHEN n = 20
      |       THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
      |                  / CAST(n * (n - 1) AS DOUBLE) / 100.0, 6) + 0.0
      |  END AS roll_cov
      |FROM s ORDER BY event_id""".stripMargin

  /** pandas `expanding().std()` — the spread member of the expanding
    * family ([[windowExpanding]] carries mean/max/n): running exact
    * cents sums n, S1, S2 over the cumulative frame, sample variance
    * (n·S2 − S1²)/(n·(n−1)) entering floating point through one
    * identical operation sequence. Cumulative frames evaluate O(1)/row
    * (running sums, never a frame rescan) — one keyed exchange, one
    * linear pass. Headroom: S2 ≤ rows·R² with R = 56021 cents needs
    * rows ≲ 3·10⁹ per KEY in int64 — beyond any per-user stream; a
    * wider domain rides DECIMAL(38,0) like the rolling quartic.
    * n = 1 emits null (pandas ddof=1 parity).
    */
  def windowExpandingStd(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val xc = round(col("value") * 100).cast("long")
    val n = count(lit(1)).over(w)
    val s1 = sum(xc).over(w)
    val s2 = sum(xc * xc).over(w)
    val den = n * s2 - s1 * s1
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), n.as("exp_n"),
        when(n >= 2,
          round(sqrt(den.cast("double") / (n * (n - 1)).cast("double")) /
            lit(100.0), 6) + lit(0.0))
          .as("exp_std"))
      .orderBy("event_id")
  }

  val windowExpandingStdSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    count(*) OVER w AS n,
      |    sum(xc) OVER w AS s1,
      |    sum(xc * xc) OVER w AS s2
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, n AS exp_n,
      |  CASE WHEN n >= 2
      |       THEN round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
      |                       / CAST(n * (n - 1) AS DOUBLE)) / 100.0, 6) + 0.0
      |  END AS exp_std
      |FROM s ORDER BY event_id""".stripMargin

  /** pandas `duplicated(subset, keep='first')` — the FLAG twin of
    * [[dedupKeepFirst]]: every row survives, carrying whether an
    * earlier row (in (ts, event_id) order) already claimed its
    * (user_id, event_type) key. One row_number window — the same
    * single keyed exchange as the dropping variant; the flag rides as
    * 0/1 BIGINT (pandas' bool Series, in the repr both engines agree
    * on). The downstream use is the audit/report path: dedup REPORTS
    * mark and count, dedup JOBS drop.
    */
  def dedupFlagDuplicates(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, sfDir).events
      .withColumn("is_dup",
        when(row_number().over(w) > 1, 1L).otherwise(0L))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("is_dup"))
      .orderByOnce("event_id")
  }

  val dedupFlagDuplicatesSql: String =
    """SELECT event_id, user_id, event_type,
      |  CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
      |    ORDER BY ts, event_id) > 1 THEN 1 ELSE 0 END AS is_dup
      |FROM events ORDER BY event_id""".stripMargin

  /** Per-key inter-arrival gap statistics (pandas
    * `ts.diff().agg(['count','mean','max','median'])` per group) — the
    * cadence profile of an event stream (alerting on silent sensors,
    * session-rate QA before sessionization). One lag() pairs each event
    * with its predecessor in (ts, event_id) order, then ONE
    * map-side-combinable aggregate per key: count, exact µs sum (mean
    * enters floating point in one final division), exact µs max, and
    * the DISCRETE median gap (index ⌊(n−1)/2⌋, 0-based 'lower' — an
    * observed gap, so exact integers end-to-end). The median rides a
    * sorted collect of the key's gaps inside the aggregate — bounded by
    * the key's event count, the same per-group-sort envelope as
    * [[graft.queries.SortSetOps.denormOrderLines]]; keys with one
    * event emit no row (no gaps — pandas diff() of a singleton is all
    * NaN).
    */
  def tsGapStats(spark: SparkSession, sfDir: String): DataFrame = {
    val o = byUser.orderBy(col("ts"), col("event_id"))
    val gaps = Tables(spark, sfDir).events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us", unix_micros(col("ts")) -
        lag(unix_micros(col("ts")), 1).over(o))
      .filter(col("gap_us").isNotNull)
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum("gap_us").as("sum_us"),
        max("gap_us").as("max_us"),
        array_sort(collect_list(col("gap_us"))).as("sorted"))
      .select(col("user_id"), col("n_gaps"),
        round(col("sum_us").cast("double") /
          (col("n_gaps").cast("double") * 1e6), 4).as("mean_gap_s"),
        (col("max_us").cast("double") / 1e6).as("max_gap_s"),
        (element_at(col("sorted"),
          (((col("n_gaps") - 1) / 2) + 1).cast("int")).cast("double") / 1e6)
          .as("median_gap_s"))
      .orderBy("user_id")
  }

  val tsGapStatsSql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts), 1)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events),
      |s AS (
      |  SELECT user_id, count(*) AS n_gaps, sum(gap_us) AS sum_us,
      |    max(gap_us) AS max_us, list_sort(list(gap_us)) AS sorted
      |  FROM g WHERE gap_us IS NOT NULL GROUP BY 1)
      |SELECT user_id, n_gaps,
      |  round(CAST(sum_us AS DOUBLE) / (CAST(n_gaps AS DOUBLE) * 1e6), 4) AS mean_gap_s,
      |  CAST(max_us AS DOUBLE) / 1e6 AS max_gap_s,
      |  CAST(sorted[CAST((n_gaps - 1) // 2 + 1 AS INT)] AS DOUBLE) / 1e6 AS median_gap_s
      |FROM s ORDER BY user_id""".stripMargin

  /** pandas `(1 + r).rolling(4).prod()` — the compounding member of
    * the rolling family (a 4-period gross growth factor). Each event
    * carries a per-period growth factor in BASIS POINTS,
    * `f = 10000 + (xc % 201) - 100` ∈ [9900, 10100] (±1%), and the
    * window product is the explicit 4-lag product
    * `f·lag1·lag2·lag3` — exact in int64 (10100⁴ ≈ 1.04e16 < 2⁶³), then
    * descaled by ONE /10¹⁶ double division. NOTE the parity mechanism
    * past 2⁵³: the peak product exceeds double's exact-integer range,
    * so the int64→double cast before the division is NOT exact — parity
    * holds because both engines perform the IDENTICAL IEEE
    * round-to-nearest conversion of the same int64 (a definition
    * choice, like the cents lattice), not because the float is exact.
    * An edit that re-orders the cast and the division, or descales in
    * two steps, breaks that identity — keep the single cast-then-divide
    * shape in BOTH SQLs (or move to the DECIMAL descale used by the
    * quartic lattice). Products are the one
    * rolling aggregate Spark's frame machinery has no native sum-form
    * for; at k=4 the lag unroll IS the right plan: three lag functions
    * share one window spec → ONE Window over ONE keyed exchange, all
    * codegen projections after. null until 3 predecessors exist
    * (pandas min_periods=4 parity).
    */
  def windowRollingProd(spark: SparkSession, sfDir: String): DataFrame = {
    val o = byUser.orderBy(col("ts"), col("event_id"))
    val xc = round(col("value") * 100).cast("long")
    val f = lit(10000L) + pmod(xc, lit(201L)) - lit(100L)
    val t = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("ts"), f.as("f"))
      .withColumn("l1", lag(col("f"), 1).over(o))
      .withColumn("l2", lag(col("f"), 2).over(o))
      .withColumn("l3", lag(col("f"), 3).over(o))
    t.select(col("event_id"), col("user_id"),
      when(col("l3").isNotNull,
        round((col("f") * col("l1") * col("l2") * col("l3")).cast("double") /
          lit(1e16), 6) + lit(0.0)).as("roll_prod"))
      .orderBy("event_id")
  }

  val windowRollingProdSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    f,
      |    lag(f, 1) OVER w AS l1,
      |    lag(f, 2) OVER w AS l2,
      |    lag(f, 3) OVER w AS l3
      |  FROM (SELECT event_id, user_id, ts,
      |          10000 + ((CAST(round(value * 100) AS BIGINT) % 201 + 201) % 201) - 100 AS f
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_id, user_id,
      |  CASE WHEN l3 IS NOT NULL
      |       THEN round(CAST(f * l1 * l2 * l3 AS DOUBLE) / 1e16, 6) + 0.0
      |  END AS roll_prod
      |FROM s ORDER BY event_id""".stripMargin

  /** pandas `rolling(6).rank(method='min')` — the rank of the CURRENT
    * value within its trailing 6-window: `1 + #{lags strictly below}`.
    * At fixed small k the lag unroll is the exact plan (six window
    * functions over ONE shared spec → one Window, one keyed exchange;
    * comparisons all codegen) — a frame-rescan rank would re-sort the
    * frame per row. Exact integer cents, no floating point anywhere.
    * null until the window fills (min_periods=6 parity).
    */
  def windowRollingRank(spark: SparkSession, sfDir: String): DataFrame = {
    val o = byUser.orderBy(col("ts"), col("event_id"))
    val xc = round(col("value") * 100).cast("long")
    val t = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("ts"), xc.as("xc"))
      .withColumn("l1", lag(col("xc"), 1).over(o))
      .withColumn("l2", lag(col("xc"), 2).over(o))
      .withColumn("l3", lag(col("xc"), 3).over(o))
      .withColumn("l4", lag(col("xc"), 4).over(o))
      .withColumn("l5", lag(col("xc"), 5).over(o))
    def below(l: Column) = when(l < col("xc"), 1L).otherwise(0L)
    t.select(col("event_id"), col("user_id"),
      when(col("l5").isNotNull,
        lit(1L) + below(col("l1")) + below(col("l2")) + below(col("l3")) +
          below(col("l4")) + below(col("l5"))).as("roll_rank"))
      .orderBy("event_id")
  }

  val windowRollingRankSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    xc,
      |    lag(xc, 1) OVER w AS l1,
      |    lag(xc, 2) OVER w AS l2,
      |    lag(xc, 3) OVER w AS l3,
      |    lag(xc, 4) OVER w AS l4,
      |    lag(xc, 5) OVER w AS l5
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_id, user_id,
      |  CASE WHEN l5 IS NOT NULL
      |       THEN 1 + (CASE WHEN l1 < xc THEN 1 ELSE 0 END)
      |              + (CASE WHEN l2 < xc THEN 1 ELSE 0 END)
      |              + (CASE WHEN l3 < xc THEN 1 ELSE 0 END)
      |              + (CASE WHEN l4 < xc THEN 1 ELSE 0 END)
      |              + (CASE WHEN l5 < xc THEN 1 ELSE 0 END)
      |  END AS roll_rank
      |FROM s ORDER BY event_id""".stripMargin

  /** pandas `rolling(4).apply(lambda w: w.nunique())` — distinct count
    * in the trailing 4-window over a small categorical domain
    * (`xc mod 5`, so the fixture actually exercises collisions):
    * `1 + [l1 new] + [l2 new vs {cur,l1}] + [l3 new vs {cur,l1,l2}]`.
    * The left-to-right dedup unroll is exact at fixed k and keeps the
    * whole query one Window + codegen comparisons — no set-typed
    * aggregation state, no frame rescan. null until the window fills.
    */
  def windowRollingNunique(spark: SparkSession, sfDir: String): DataFrame = {
    val o = byUser.orderBy(col("ts"), col("event_id"))
    val d = pmod(round(col("value") * 100).cast("long"), lit(5L))
    val t = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("ts"), d.as("d"))
      .withColumn("l1", lag(col("d"), 1).over(o))
      .withColumn("l2", lag(col("d"), 2).over(o))
      .withColumn("l3", lag(col("d"), 3).over(o))
    val n1 = when(col("l1") =!= col("d"), 1L).otherwise(0L)
    val n2 = when(col("l2") =!= col("d") && col("l2") =!= col("l1"), 1L)
      .otherwise(0L)
    val n3 = when(col("l3") =!= col("d") && col("l3") =!= col("l1") &&
      col("l3") =!= col("l2"), 1L).otherwise(0L)
    t.select(col("event_id"), col("user_id"),
      when(col("l3").isNotNull, lit(1L) + n1 + n2 + n3).as("roll_nunique"))
      .orderBy("event_id")
  }

  val windowRollingNuniqueSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    d,
      |    lag(d, 1) OVER w AS l1,
      |    lag(d, 2) OVER w AS l2,
      |    lag(d, 3) OVER w AS l3
      |  FROM (SELECT event_id, user_id, ts,
      |          (CAST(round(value * 100) AS BIGINT) % 5 + 5) % 5 AS d
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_id, user_id,
      |  CASE WHEN l3 IS NOT NULL
      |       THEN 1 + (CASE WHEN l1 <> d THEN 1 ELSE 0 END)
      |              + (CASE WHEN l2 <> d AND l2 <> l1 THEN 1 ELSE 0 END)
      |              + (CASE WHEN l3 <> d AND l3 <> l1 AND l3 <> l2 THEN 1 ELSE 0 END)
      |  END AS roll_nunique
      |FROM s ORDER BY event_id""".stripMargin

  /** pandas `between_time('09:00', '17:00')` + hourly profile — the
    * time-of-day selection every ops/trading pipeline runs: keep events
    * whose clock time falls in [09:00, 17:00) regardless of date, then
    * profile count / exact mean value per (event_type, hour). The
    * predicate is a pure codegen projection over the scan (partition-
    * prunable when the layout is hour-bucketed); one COUNT-level
    * aggregate; output ≤ types×8 rows.
    */
  def tsBetweenTime(spark: SparkSession, sfDir: String): DataFrame = {
    val hr = hour(col("ts"))
    Tables(spark, sfDir).events
      .filter(hr >= 9 && hr < 17)
      .groupBy(col("event_type"), hr.as("hr"))
      // davgExact, not davg: the sf0.001 fixture lands one (type, hr)
      // cell's mean exactly on the 10⁻⁴ half-boundary, where the two
      // engines' round(double, 4) disagree by an ulp (r18 fix — see
      // util.davgExact; all other cells are bit-identical to davg)
      .agg(count(lit(1)).as("n"),
        util.davgExact("value", 4).as("mean_value"))
      .orderBy("event_type", "hr")
  }

  val tsBetweenTimeSql: String =
    s"""SELECT event_type, CAST(hour(ts) AS INT) AS hr, count(*) AS n,
       |  ${util.davgExactSql("value", 4)} AS mean_value
       |FROM events
       |WHERE hour(ts) >= 9 AND hour(ts) < 17
       |GROUP BY 1, 2 ORDER BY event_type, hr""".stripMargin

  /** pandas `shift(freq='D')` day-over-day change — the CALENDAR-aligned
    * twin of [[windowPctChange]] (which is row-aligned): per user, daily
    * cent totals, and each day compares against the value of the day
    * EXACTLY one calendar day earlier — a gap day yields null, where a
    * row shift would silently compare across the gap. One daily
    * aggregate (map-side combinable) then one lag window with a
    * datediff guard over the |user×day| frame — no self-join on day-1,
    * no calendar spine upsample. The percent enters floating point
    * through one identical division of exact cent integers.
    */
  def tsDodChange(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables(spark, sfDir).events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val o = Window.partitionBy("user_id").orderBy("day")
    daily
      .withColumn("prev_day", lag(col("day"), 1).over(o))
      .withColumn("prev_cents", lag(col("cents"), 1).over(o))
      .select(col("user_id"), fmtDay(col("day")).as("day"),
        (col("cents").cast("double") / 100.0).as("day_total"),
        when(datediff(col("day"), col("prev_day")) === 1 && col("prev_cents") =!= 0,
          round((col("cents") - col("prev_cents")).cast("double") /
            col("prev_cents").cast("double"), 6) + lit(0.0))
          .as("dod_change"))
      .orderBy("user_id", "day")
  }

  val tsDodChangeSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT user_id, day, cents,
      |    lag(day, 1) OVER w AS prev_day,
      |    lag(cents, 1) OVER w AS prev_cents
      |  FROM daily
      |  WINDOW w AS (PARTITION BY user_id ORDER BY day))
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
      |  CAST(cents AS DOUBLE) / 100.0 AS day_total,
      |  CASE WHEN datediff('day', prev_day, day) = 1 AND prev_cents <> 0
      |       THEN round(CAST(cents - prev_cents AS DOUBLE)
      |                  / CAST(prev_cents AS DOUBLE), 6) + 0.0
      |  END AS dod_change
      |FROM l ORDER BY user_id, day""".stripMargin

  /** pandas `expanding().corr(other)` — the normalized sibling of
    * [[windowExpandingStd]] over the (value-cents, event_id mod 97)
    * pair: six running exact integer co-moments over the cumulative
    * frame (O(1)/row — running sums, never a frame rescan), one
    * identical float entry at the end. Headroom: the n·Sxy and Sx·Sy
    * products peak ≈ rows²·R·96 — inside int64 through ~40 k rows per
    * KEY (this fixture family: ≤ a few hundred); a wider stream rides
    * the DECIMAL(38,0) discipline of the rolling quartic. n = 1 or a
    * zero-variance prefix emits null (pandas parity).
    */
  def windowExpandingCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val xc = round(col("value") * 100).cast("long")
    val y = col("event_id") % 97
    val n = count(lit(1)).over(w)
    val sx = sum(xc).over(w); val sy = sum(y).over(w)
    val sxx = sum(xc * xc).over(w); val syy = sum(y * y).over(w)
    val sxy = sum(xc * y).over(w)
    val dx = n * sxx - sx * sx
    val dy = n * syy - sy * sy
    Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        when(n >= 2 && dx > 0 && dy > 0,
          round((n * sxy - sx * sy).cast("double") /
            (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))), 6) + lit(0.0))
          .as("exp_corr"))
      .orderBy("event_id")
  }

  val windowExpandingCorrSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    count(*) OVER w AS n,
      |    sum(xc) OVER w AS sx,
      |    sum(y) OVER w AS sy,
      |    sum(xc * xc) OVER w AS sxx,
      |    sum(y * y) OVER w AS syy,
      |    sum(xc * y) OVER w AS sxy
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc,
      |          event_id % 97 AS y
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |       THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
      |                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) + 0.0
      |  END AS exp_corr
      |FROM s ORDER BY event_id""".stripMargin

  /** pandas `ewm(alpha=0.1).var(bias=False)` — the spread member of the
    * EWM family ([[windowEwm]] carries the mean): with the same
    * position-indexed weights w_i = (1−α)^(−i), reliability-weighted
    * sample variance
    * `(Sw·Sxx − Sx²) / (Sw² − Sww)` from FOUR running weighted prefix
    * sums over one shared cumulative frame.
    *
    * Unlike the mean (whose Sx/Sw ratio forgives last-ulp sum drift),
    * the variance numerator CANCELS two nearly-equal large terms, so a
    * plain sum(double) diverges between engines at the rounding grid —
    * the sf0.1 sweep caught exactly that (10 cells split a 1e-4
    * boundary: Spark accumulates the frame sequentially, DuckDB's
    * segment tree adds in a different order). The fix is the house
    * lattice discipline: each weighted PRODUCT is quantized once to
    * DECIMAL(38,6) (identical double→decimal rounding in both engines,
    * a definition choice like the cents lattice), the window sums are
    * then EXACT, and each re-enters double through the dsumExact
    * scaled-BIGINT path — so both engines run the identical final
    * float sequence. Envelope: every ×10⁶-scaled sum must stay inside
    * int64, and the BINDING sum decides the horizon: the
    * value-independent Σw² (w = 0.9^−(i−1)) crosses 2⁶³−1 at exactly
    * n = 135 and Σv²·w at the |value| ≤ 10³ ceiling crosses near
    * n = 132, so the last row count where EVERY lattice sum is safe is
    * n = 131 — the r16 guard sat at 135 and let a 132–135-row
    * ceiling-value key slip past it into the silent-null overflow the
    * guard exists to stop (r16 ADVICE; Round17Spec plants exactly that
    * key). Fixture keys hold ≤ 99; past the horizon the scan-based
    * [[graft.operators.Ewm.withEwmVar]] carry (which renormalizes per
    * step and never materializes growing weights) is the scale path,
    * and [[windowEwmVarAuto]] routes long keys there automatically.
    * The horizon is GUARDED at runtime: a key longer than 131 rows
    * fails loudly (`assert_true` on the row number, folded into the
    * weight column so the optimizer cannot prune it) instead of
    * silently emitting the nulls Spark's non-ANSI decimal→long cast
    * would produce — matching the oracle, which errors on the same
    * overflow. The guard never fires inside the documented envelope,
    * so parity is untouched. n = 1 (denominator 0) emits null.
    */
  def windowEwmVar(spark: SparkSession, sfDir: String): DataFrame =
    ewmVarLattice(Tables(spark, sfDir).events).orderByOnce("event_id")

  /** Last per-key row count where EVERY ×10⁶-scaled DECIMAL lattice sum
    * of [[windowEwmVar]] stays inside int64 (the binding envelope is
    * Σv²·w at the |value| ≤ 10³ ceiling, crossing near n = 132; the
    * value-independent Σw² crosses at n = 135).
    */
  private[graft] val EwmVarHorizon = 131

  private def ewmVarLattice(events: DataFrame): DataFrame = {
    val alpha = 0.1
    val horizon = EwmVarHorizon
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def exact(c: Column): Column =
      ((sum(c.cast("decimal(38,6)")).over(run)) * lit(1000000L))
        .cast("long").cast("double") / lit(1e6)
    val rn = row_number().over(order)
    events
      .withColumn("__w",
        when(assert_true(rn <= lit(horizon),
            lit(s"windowEwmVar: key exceeds the $horizon-row weight " +
              "horizon - the scaled-BIGINT lattice would overflow; use " +
              "the scan-based Ewm operator for long keys")).isNull,
          pow(lit(1.0 - alpha), -(rn - 1).cast("double"))))
      // all four running sums in ONE projection → one shared WindowExec
      // after the weight pass (chained withColumns fragment into four)
      .select(col("event_id"), col("user_id"), col("value"),
        exact(col("__w")).as("sw"),
        exact(col("__w") * col("__w")).as("sww"),
        exact(col("value") * col("__w")).as("sx"),
        exact(col("value") * col("value") * col("__w")).as("sxx"))
      .select(col("event_id"), col("user_id"),
        when(col("sw") * col("sw") - col("sww") > 0,
          round((col("sw") * col("sxx") - col("sx") * col("sx")) /
            (col("sw") * col("sw") - col("sww")), 4) + lit(0.0))
          .as("ewm_var"))
  }

  /** [[windowEwmVar]] without the per-key size ceiling (r16 verdict
    * #3): keys inside the 131-row lattice horizon keep the declared
    * query's exact cross-engine lattice semantics bit-for-bit; longer
    * keys — where the ×10⁶-scaled DECIMAL sums would overflow int64 —
    * route through the scan-based
    * [[graft.operators.Ewm.withEwmVar]] affine carry instead of
    * raising (decayed weights renormalize per step, bounded at ANY
    * length; the variance ratio is weight-scale-invariant, so decayed
    * and growing weights define the identical statistic — the two
    * paths differ only at float-rounding granularity, which the
    * 4-decimal output grid absorbs except on knife-edge cells). The
    * split costs one count window over the partitioning the lattice
    * pass already builds; at fixture scale the long branch is empty,
    * so the DECLARED query keeps its loud guard and the oracle is
    * untouched — this variant is spec-gated (Round17Spec plants a
    * 200-row ceiling key and proves the routing matches the scan path
    * exactly while short keys match the lattice exactly).
    */
  def windowEwmVarAuto(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables(spark, sfDir).events
    val tagged = events.withColumn("__n",
      count(lit(1)).over(Window.partitionBy(col("user_id"))))
    val shortKeys = tagged.filter(col("__n") <= EwmVarHorizon).drop("__n")
    val longKeys = tagged.filter(col("__n") > EwmVarHorizon).drop("__n")
    val scanned = graft.operators.Ewm
      .withEwmVar(longKeys, Seq("user_id"), Seq("ts", "event_id"),
        "value", alpha = 0.1, outCol = "__ev")
      .select(col("event_id"), col("user_id"),
        (round(col("__ev"), 4) + lit(0.0)).as("ewm_var"))
    ewmVarLattice(shortKeys).unionByName(scanned).orderByOnce("event_id")
  }

  val windowEwmVarSql: String =
    """WITH t AS (
      | SELECT event_id, user_id, ts, value,
      |  power(0.9, -CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS DOUBLE)) AS w
      | FROM events),
      |s AS (
      | SELECT event_id, user_id,
      |  CAST(CAST(sum(CAST(w AS DECIMAL(38,6))) OVER win * 1000000 AS BIGINT) AS DOUBLE) / 1e6 AS sw,
      |  CAST(CAST(sum(CAST(w * w AS DECIMAL(38,6))) OVER win * 1000000 AS BIGINT) AS DOUBLE) / 1e6 AS sww,
      |  CAST(CAST(sum(CAST(value * w AS DECIMAL(38,6))) OVER win * 1000000 AS BIGINT) AS DOUBLE) / 1e6 AS sx,
      |  CAST(CAST(sum(CAST(value * value * w AS DECIMAL(38,6))) OVER win * 1000000 AS BIGINT) AS DOUBLE) / 1e6 AS sxx
      | FROM t
      | WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      | CASE WHEN sw * sw - sww > 0
      |      THEN round((sw * sxx - sx * sx) / (sw * sw - sww), 4) + 0.0
      | END AS ewm_var
      |FROM s ORDER BY event_id""".stripMargin

  /** Naive seasonal decomposition (statsmodels `seasonal_decompose`,
    * additive, period 7) on each user's DAILY series: trend = centered
    * 7-day rolling mean (full windows only), seasonal = the day-of-week
    * mean of the detrended values, residual = x − trend − seasonal.
    * Everything stays on the integer lattice until two final
    * divisions: the detrended value is carried as `7x − Σ₇` (an exact
    * int — multiplying through by the window width defers the /7), and
    * the seasonal means divide exact sums once. One daily aggregate,
    * one centered window over the same keyed exchange, a ≤7-row
    * seasonal frame broadcast back — the decomposition never re-sorts
    * or joins the series to itself.
    *
    * POOLED-seasonal semantics, on purpose: the day-of-week means are
    * computed over ALL users' detrended values, not per series — the
    * fleet-calendar read (one shared weekly shape), not statsmodels'
    * per-series decompose (which would key the seasonal frame by
    * (user_id, dow) and join on user_id — same plan shape, bigger
    * frame). The seasonal attach is a LEFT join, so a user-day whose
    * day-of-week has no full-window detrended sample anywhere still
    * emits (null seasonal/residual) instead of vanishing; on this
    * fixture every dow has samples, so the two joins coincide.
    */
  def tsSeasonalDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables(spark, sfDir).events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("xc"))
    val w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-3, 3)
    val t = daily
      .select(col("user_id"), col("day"), col("xc"),
        count(lit(1)).over(w).as("wn"), sum(col("xc")).over(w).as("ws"))
      .withColumn("det7",
        when(col("wn") === 7, lit(7L) * col("xc") - col("ws")))
    val seasonal = t.filter(col("det7").isNotNull)
      .groupBy(dayofweek(col("day")).as("dow"))
      .agg(count(lit(1)).as("sn"), sum(col("det7")).as("ss"))
    t.join(broadcast(seasonal), dayofweek(col("day")) === col("dow"), "left")
      .select(col("user_id"), fmtDay(col("day")).as("day"),
        (col("xc").cast("double") / 100.0).as("day_total"),
        when(col("wn") === 7,
          round(col("ws").cast("double") / 700.0, 6) + lit(0.0)).as("trend"),
        round(col("ss").cast("double") /
          (lit(7.0) * col("sn").cast("double")) / 100.0, 6).as("seasonal"),
        when(col("wn") === 7,
          round((col("xc").cast("double") - col("ws").cast("double") / 7.0 -
            col("ss").cast("double") / (lit(7.0) * col("sn").cast("double"))) /
            100.0, 6) + lit(0.0)).as("residual"))
      .orderByOnce("user_id", "day")
  }

  val tsSeasonalDecomposeSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS xc
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT user_id, day, xc,
      |    count(*) OVER w AS wn,
      |    sum(xc) OVER w AS ws
      |  FROM daily
      |  WINDOW w AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |d AS (
      |  SELECT *, CASE WHEN wn = 7 THEN 7 * xc - ws END AS det7 FROM t),
      |seasonal AS (
      |  SELECT dayofweek(day) + 1 AS dow, count(*) AS sn,
      |    CAST(sum(det7) AS BIGINT) AS ss
      |  FROM d WHERE det7 IS NOT NULL GROUP BY 1)
      |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
      |  CAST(xc AS DOUBLE) / 100.0 AS day_total,
      |  CASE WHEN wn = 7
      |       THEN round(CAST(ws AS DOUBLE) / 700.0, 6) + 0.0 END AS trend,
      |  round(CAST(ss AS DOUBLE) / (7.0 * CAST(sn AS DOUBLE)) / 100.0, 6) AS seasonal,
      |  CASE WHEN wn = 7
      |       THEN round((CAST(xc AS DOUBLE) - CAST(ws AS DOUBLE) / 7.0
      |                   - CAST(ss AS DOUBLE) / (7.0 * CAST(sn AS DOUBLE))) / 100.0, 6) + 0.0
      |  END AS residual
      |FROM d LEFT JOIN seasonal ON dayofweek(day) + 1 = dow
      |ORDER BY user_id, day""".stripMargin

  /** CUSUM control chart (Page 1954) — sequential upward-shift
    * detection per user: with per-series mean μ and slack k,
    * `S_t = max(0, S_{t-1} + (x_t − μ − k))` alarms when S_t > h.
    * The recursion is NOT a prefix sum, but its closed form is:
    * `S_t = P_t − min_{j≤t} P_j` with `P = Σ(x − μ − k)` — the
    * drawdown structure ([[windowDrawdown]]) pointed at the mean.
    * Everything rides the exact integer lattice by multiplying
    * through by n (the series length): `dev = n·x − Σx − n·k` defers
    * the /n, so P and its running min are exact int64 and the alarm
    * compare `S > n·h` is integer. Three window passes (full-partition
    * moments, running sum, running min) share ONE keyed exchange and
    * one sort; descale happens once at emission. Headroom:
    * |dev| ≤ 2n·R → P ≤ 2n²R ≈ 6e13 at 10⁴ rows/key — int64 to
    * ~10⁶ rows/key.
    */
  def tsCusumAlarm(spark: SparkSession, sfDir: String): DataFrame = {
    val kCents = 50L // slack: a drift below 0.50/event is absorbed
    val hCents = 500L // alarm threshold 5.00 cumulative
    val o = byUser.orderBy(col("ts"), col("event_id"))
    val full = byUser.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val run = o.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val xc = round(col("value") * 100).cast("long")
    val t = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("ts"), xc.as("xc"))
      .select(col("event_id"), col("user_id"), col("ts"), col("xc"),
        count(lit(1)).over(full).as("n"), sum(col("xc")).over(full).as("sx"))
      .withColumn("p",
        sum(col("n") * col("xc") - col("sx") - col("n") * lit(kCents)).over(run))
      .withColumn("pmin", min(col("p")).over(run))
    // emit the statistic as an exact half-up-rounded integer in 1e-6
    // units (the covE6 device): a double division lands exactly on
    // .5e-6 ties when n·100 divides the deviation sum, and the two
    // engines break those ties differently — caught at sf0.01
    t.select(col("event_id"), col("user_id"),
        // the running min must include the EMPTY prefix (P_0 = 0), or
        // an all-positive head would zero S_1 where the recursion says
        // max(0, dev_1) — hence least(pmin, 0)
        expr("CAST((CAST(p - least(pmin, 0) AS DECIMAL(38,0)) * 2000000 + n * 100) " +
          "DIV (2 * CAST(n AS DECIMAL(38,0)) * 100) AS BIGINT)").as("cusum_e6"),
        (col("p") - least(col("pmin"), lit(0L)) > col("n") * lit(hCents)).as("alarm"))
      .orderBy("event_id")
  }

  val tsCusumAlarmSql: String =
    """WITH b AS (
      |  SELECT event_id, user_id, ts,
      |    CAST(round(value * 100) AS BIGINT) AS xc
      |  FROM events),
      |m AS (
      |  SELECT event_id, user_id, ts, xc,
      |    count(*) OVER u AS n,
      |    sum(xc) OVER u AS sx
      |  FROM b
      |  WINDOW u AS (PARTITION BY user_id)),
      |p AS (
      |  SELECT event_id, user_id, ts, n,
      |    sum(n * xc - sx - n * 50) OVER w AS p
      |  FROM m
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |q AS (
      |  SELECT event_id, user_id, n, p,
      |    min(p) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pmin
      |  FROM p)
      |SELECT event_id, user_id,
      |  CAST((CAST(p - least(pmin, 0) AS HUGEINT) * 2000000 + n * 100) // (2 * CAST(n AS HUGEINT) * 100) AS BIGINT) AS cusum_e6,
      |  p - least(pmin, 0) > n * 500 AS alarm
      |FROM q ORDER BY event_id""".stripMargin

  /** pandas `rolling(20).idxmax()` — WHERE in the trailing window the
    * maximum sits, not just its value (the rolling twin of
    * [[graft.queries.Aggregations.aggIdxmax]], and the same packing
    * trick): each row encodes `(cents + 10⁷)·2³² + (2³²−1−event_id)`
    * into ONE BIGINT, so a single running `max` carries value AND
    * position, and the inverted id term makes ties resolve to the
    * EARLIEST row — pandas' first-max rule — because the larger
    * complement wins. Decode is two integer ops. One window function
    * where the naive form needs a frame rescan per row; exact at any
    * scale (headroom: (10⁷+10⁷)·2³² ≈ 8.6e16 ≪ 2⁶³; event_id < 2³²
    * through the sfx100 proxy's id offsets). null until the window
    * fills.
    */
  def windowRollingIdxmax(spark: SparkSession, sfDir: String): DataFrame = {
    val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val xc = round(col("value") * 100).cast("long")
    val key = (xc + lit(10000000L)) * lit(4294967296L) +
      (lit(4294967295L) - col("event_id"))
    Tables(spark, sfDir).events
      // both window expressions in ONE projection so they share a
      // single WindowExec (chained withColumns fragment the plan —
      // caught by the audit's Window-count cap)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("__n"), max(key).over(w).as("__mk"))
      .select(col("event_id"), col("user_id"),
        when(col("__n") === 20,
          lit(4294967295L) - pmod(col("__mk"), lit(4294967296L)))
          .as("idxmax_event"),
        when(col("__n") === 20,
          (expr("__mk div 4294967296") - lit(10000000L)).cast("double") / 100.0)
          .as("roll_max"))
      .orderBy("event_id")
  }

  val windowRollingIdxmaxSql: String =
    """WITH s AS (
      |  SELECT event_id, user_id,
      |    count(*) OVER w AS n,
      |    max((xc + 10000000) * 4294967296 + (4294967295 - event_id)) OVER w AS mk
      |  FROM (SELECT event_id, user_id, ts,
      |          CAST(round(value * 100) AS BIGINT) AS xc
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id,
      |  CASE WHEN n = 20 THEN 4294967295 - mk % 4294967296 END AS idxmax_event,
      |  CASE WHEN n = 20 THEN CAST(mk // 4294967296 - 10000000 AS DOUBLE) / 100.0 END AS roll_max
      |FROM s ORDER BY event_id""".stripMargin

  /** Seasonal anomaly detection — the hour-of-week profile gate every
    * metrics pipeline runs: each (event_type, day-of-week, hour) cell
    * gets exact count/mean/σ from one integer co-moment aggregate over
    * the full log; the ≤ types×168-cell profile BROADCASTS back onto
    * the stream, each event scores `z = (x−μ)/σ` against ITS cell, and
    * the top-50 |z| anomalies surface via TakeOrdered. The fact table
    * shuffles once (the profile aggregate); the scoring pass is a
    * broadcast-join projection — at 100 TB the profile is still 168
    * rows per type. z enters floating point through one identical
    * operation sequence from exact int sums; cells need n ≥ 2 and
    * positive variance.
    */
  def tsSeasonalAnomaly(spark: SparkSession, sfDir: String): DataFrame =
    seasonalAnomalies(spark, sfDir, threshold = 3.0)

  /** [[tsSeasonalAnomaly]] with the σ gate and cell granularity
    * exposed — the spec drives a lower gate over hour-only cells so the
    * sf0.001 fixture (≈1 event per hour-of-week cell, where a 2-row
    * cell's |z| cannot exceed 1/√2) still exercises the scoring and
    * ranking non-vacuously.
    */
  private[graft] def seasonalAnomalies(spark: SparkSession, sfDir: String,
      threshold: Double, byDow: Boolean = true): DataFrame = {
    val e = Tables(spark, sfDir).events
      .select(col("event_id"), col("event_type"),
        (if (byDow) dayofweek(col("ts")) else lit(1)).as("dow"),
        hour(col("ts")).as("hr"),
        round(col("value") * 100).cast("long").as("xc"))
    val prof = e.groupBy("event_type", "dow", "hr")
      .agg(count(lit(1)).as("n"),
        sum(col("xc").cast("decimal(38,0)")).as("s1"),
        sum((col("xc") * col("xc")).cast("decimal(38,0)")).as("s2"))
    val den = (col("n") * col("s2") - col("s1") * col("s1")).cast("double")
    val z = (col("n") * col("xc") - col("s1")).cast("double") /
      (sqrt(den) * sqrt(col("n").cast("double")) / sqrt((col("n") - 1).cast("double")))
    e.join(broadcast(prof), Seq("event_type", "dow", "hr"))
      .filter(col("n") >= 2 && den > 0)
      .select(col("event_id"), col("event_type"), col("dow"), col("hr"),
        (col("xc").cast("double") / 100.0).as("value"),
        round(z, 6).as("z"))
      .filter(abs(col("z")) > threshold)
      .orderByOnce(abs(col("z")).desc, col("event_id"))
      .limit(50)
  }

  val tsSeasonalAnomalySql: String =
    """WITH e AS (
      |  SELECT event_id, event_type, dayofweek(ts) + 1 AS dow, hour(ts) AS hr,
      |    CAST(round(value * 100) AS BIGINT) AS xc
      |  FROM events),
      |prof AS (
      |  SELECT event_type, dow, hr, count(*) AS n,
      |    sum(CAST(xc AS DECIMAL(38,0))) AS s1,
      |    sum(CAST(xc * xc AS DECIMAL(38,0))) AS s2
      |  FROM e GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT event_id, e.event_type, e.dow, e.hr,
      |    CAST(xc AS DOUBLE) / 100.0 AS value,
      |    round(CAST(n * xc - s1 AS DOUBLE)
      |          / (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
      |             * sqrt(CAST(n AS DOUBLE)) / sqrt(CAST(n - 1 AS DOUBLE))), 6) AS z
      |  FROM e JOIN prof ON e.event_type = prof.event_type
      |    AND e.dow = prof.dow AND e.hr = prof.hr
      |  WHERE n >= 2 AND n * s2 - s1 * s1 > 0)
      |SELECT * FROM scored WHERE abs(z) > 3.0
      |ORDER BY abs(z) DESC, event_id LIMIT 50""".stripMargin

  /** Holt linear-trend exponential smoothing per user over the daily
    * series — the first FORECASTING member of the ts family (CUSUM
    * detects, seasonal decomposes; this projects forward): classical
    * init l₁ = x₁, b₁ = x₂ − x₁, then for t ≥ 2
    * `l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}` (α=0.3, β=0.2), emitting
    * the final (level, trend) state and the 7-step-ahead forecast
    * l_T + 7·b_T. On exactly linear data the recursion tracks exactly
    * (l_t = x_t, b_t = the slope — spec-pinned), the property that
    * makes it a sane baseline forecaster.
    *
    * Cross-engine float discipline: the recursion is NOT a prefix sum,
    * so instead of a closed form both engines run the IDENTICAL
    * sequential operation list — Spark in a per-user fold (daily cents
    * as exact integers entering double once), DuckDB in a recursive
    * CTE whose step expressions are written token-for-token the same;
    * one rounding at emission. Users need ≥ 2 days (the init), else
    * they are omitted.
    *
    * Scale: the fold runs per USER over the DAILY grid — series length
    * is bounded by the calendar (≤ a few thousand rows per key at any
    * corpus size), so the in-memory group sort is safe; an unbounded
    * single key would ride the [[graft.operators.Ewm]] affine-block
    * device generalized to the 2×2 Holt map (compose-associative, same
    * two-pass shape) — not needed for any declared surface.
    */
  def tsHoltForecast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    Tables(spark, sfDir).events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("xc"))
      .select(col("user_id"), col("day").cast("string").as("day"), col("xc"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (u, it) =>
        // ISO day strings sort chronologically; series length is
        // calendar-bounded, so the group materializes safely
        val xs = it.toArray.sortBy(_._2).map(_._3.toDouble)
        if (xs.length < 2) Iterator.empty
        else {
          var l = xs(0)
          var b = xs(1) - xs(0)
          var t = 1
          while (t < xs.length) {
            val x = xs(t)
            val lNew = 0.3 * x + 0.7 * (l + b)
            b = 0.2 * (lNew - l) + 0.8 * b
            l = lNew
            t += 1
          }
          Iterator.single((u, xs.length.toLong,
            r6(l / 100), r6(b / 100), r6((l + 7 * b) / 100)))
        }
      }
      .toDF("user_id", "n_days", "level", "trend", "forecast_7d")
      .orderBy("user_id")
  }

  val tsHoltForecastSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS x
      |  FROM events GROUP BY 1, 2),
      |seq AS (
      |  SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY d) AS i, x
      |  FROM daily),
      |nd AS (SELECT user_id, count(*) AS n_days FROM seq GROUP BY 1),
      |rec AS (
      |  SELECT s1.user_id, 1 AS i, s1.x AS l, s2.x - s1.x AS b
      |  FROM seq s1 JOIN seq s2 ON s1.user_id = s2.user_id AND s1.i = 1 AND s2.i = 2
      |  UNION ALL
      |  SELECT r.user_id, r.i + 1,
      |    0.3 * s.x + 0.7 * (r.l + r.b),
      |    0.2 * ((0.3 * s.x + 0.7 * (r.l + r.b)) - r.l) + 0.8 * r.b
      |  FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1)
      |SELECT r.user_id, n.n_days,
      |  round(r.l / 100, 6) + 0.0 AS level,
      |  round(r.b / 100, 6) + 0.0 AS trend,
      |  round((r.l + 7 * r.b) / 100, 6) + 0.0 AS forecast_7d
      |FROM rec r JOIN nd n ON r.user_id = n.user_id AND r.i = n.n_days
      |ORDER BY r.user_id""".stripMargin

  /** Holt-Winters ADDITIVE seasonal smoothing (period 7) per user over
    * the daily series — [[tsHoltForecast]]'s completion (r16 verdict
    * #2): the triple-exponential form a telemetry user reaches for
    * when the series has a weekly shape the trend-only model aliases
    * into its slope. Classical two-period init over the first 14
    * observed days (l₇ = mean(x₁..x₇), b₇ = (Σx₈..₁₄ − Σx₁..₇)/49,
    * sᵢ = xᵢ − l₇), then for t ≥ 8 with α=0.3, β=0.2, γ=0.1:
    * `l_t = α(x_t − s_{t−7}) + (1−α)(l_{t−1} + b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}`,
    * `s_t = γ(x_t − l_{t−1} − b_{t−1}) + (1−γ)s_{t−7}`.
    * Emits the final level/trend, the final seasonal slot, and the
    * 7-step-ahead forecast l_T + 7·b_T + s_T (h=7 lands back on T's
    * own phase). On exactly period-7 data the recursion is a fixed
    * point — level constant, trend 0, forecast_7d equal to the TRUE
    * next-week value, bit-for-bit (Round17Spec plants that series).
    * Users need ≥ 14 observed days (the two-period init), else
    * omitted. Positions are observed-day indexes (calendar gaps
    * compress), identically in both engines.
    *
    * Cross-engine float discipline, inherited from [[tsHoltForecast]]:
    * the recursion is not a prefix sum, so both engines run the
    * IDENTICAL sequential operation list — Spark in a per-user fold,
    * DuckDB in a recursive CTE whose state carries the seven seasonal
    * slots as columns and whose step expressions are written
    * token-for-token the same (the l_t expression is repeated inside
    * b_t rather than aliased, exactly as the Holt oracle does); init
    * sums are integer-cent sums (order-independent), every division
    * appears in the same place in both texts, one rounding at
    * emission. Scale: the same calendar-bounded per-key fold as Holt;
    * an unbounded key would need the affine-block device generalized
    * to the 9×9 (l, b, s₀..s₆) linear map — noted, not needed for any
    * declared surface.
    */
  def tsHwForecast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir).events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("xc"))
      .select(col("user_id"), col("day").cast("string").as("day"), col("xc"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (u, it) =>
        val xs = it.toArray.sortBy(_._2).map(_._3.toDouble)
        if (xs.length < HoltWinters.InitLen) Iterator.empty
        else {
          var (l, b, s) = HoltWinters.init(xs.take(HoltWinters.InitLen))
          var t = HoltWinters.InitLen
          while (t < xs.length) {
            val (ln, bn) = HoltWinters.step(l, b, s, xs(t), t)
            l = ln; b = bn; t += 1
          }
          val (n, lv, tr, se, fc) = HoltWinters.emit(xs.length.toLong, l, b, s)
          Iterator.single((u, n, lv, tr, se, fc))
        }
      }
      .toDF("user_id", "n_days", "level", "trend", "seasonal", "forecast_7d")
      .orderBy("user_id")
  }

  val tsHwForecastSql: String =
    """WITH RECURSIVE daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS x
      |  FROM events GROUP BY 1, 2),
      |seq AS (
      |  SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY d) AS i, x
      |  FROM daily),
      |nd AS (SELECT user_id, count(*) AS n_days FROM seq GROUP BY 1),
      |base AS (
      |  SELECT s.user_id, 7 AS i,
      |    sum(CASE WHEN s.i <= 7 THEN s.x END) / 7 AS l,
      |    (sum(CASE WHEN s.i BETWEEN 8 AND 14 THEN s.x END)
      |     - sum(CASE WHEN s.i <= 7 THEN s.x END)) / 49 AS b,
      |    max(CASE WHEN s.i = 1 THEN s.x END) - sum(CASE WHEN s.i <= 7 THEN s.x END) / 7 AS s0,
      |    max(CASE WHEN s.i = 2 THEN s.x END) - sum(CASE WHEN s.i <= 7 THEN s.x END) / 7 AS s1,
      |    max(CASE WHEN s.i = 3 THEN s.x END) - sum(CASE WHEN s.i <= 7 THEN s.x END) / 7 AS s2,
      |    max(CASE WHEN s.i = 4 THEN s.x END) - sum(CASE WHEN s.i <= 7 THEN s.x END) / 7 AS s3,
      |    max(CASE WHEN s.i = 5 THEN s.x END) - sum(CASE WHEN s.i <= 7 THEN s.x END) / 7 AS s4,
      |    max(CASE WHEN s.i = 6 THEN s.x END) - sum(CASE WHEN s.i <= 7 THEN s.x END) / 7 AS s5,
      |    max(CASE WHEN s.i = 7 THEN s.x END) - sum(CASE WHEN s.i <= 7 THEN s.x END) / 7 AS s6
      |  FROM seq s JOIN nd ON s.user_id = nd.user_id AND nd.n_days >= 14
      |  WHERE s.i <= 14 GROUP BY s.user_id),
      |rec AS (
      |  SELECT user_id, i, l, b, s0, s1, s2, s3, s4, s5, s6 FROM base
      |  UNION ALL
      |  SELECT r.user_id, r.i + 1,
      |    0.3 * (s.x - CASE r.i % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5 ELSE r.s6 END) + 0.7 * (r.l + r.b),
      |    0.2 * ((0.3 * (s.x - CASE r.i % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5 ELSE r.s6 END) + 0.7 * (r.l + r.b)) - r.l) + 0.8 * r.b,
      |    CASE WHEN r.i % 7 = 0 THEN 0.1 * (s.x - r.l - r.b) + 0.9 * r.s0 ELSE r.s0 END,
      |    CASE WHEN r.i % 7 = 1 THEN 0.1 * (s.x - r.l - r.b) + 0.9 * r.s1 ELSE r.s1 END,
      |    CASE WHEN r.i % 7 = 2 THEN 0.1 * (s.x - r.l - r.b) + 0.9 * r.s2 ELSE r.s2 END,
      |    CASE WHEN r.i % 7 = 3 THEN 0.1 * (s.x - r.l - r.b) + 0.9 * r.s3 ELSE r.s3 END,
      |    CASE WHEN r.i % 7 = 4 THEN 0.1 * (s.x - r.l - r.b) + 0.9 * r.s4 ELSE r.s4 END,
      |    CASE WHEN r.i % 7 = 5 THEN 0.1 * (s.x - r.l - r.b) + 0.9 * r.s5 ELSE r.s5 END,
      |    CASE WHEN r.i % 7 = 6 THEN 0.1 * (s.x - r.l - r.b) + 0.9 * r.s6 ELSE r.s6 END
      |  FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1)
      |SELECT r.user_id, n.n_days,
      |  round(r.l / 100, 6) + 0.0 AS level,
      |  round(r.b / 100, 6) + 0.0 AS trend,
      |  round(CASE (n.n_days - 1) % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5 ELSE r.s6 END / 100, 6) + 0.0 AS seasonal,
      |  round((r.l + 7 * r.b + CASE (n.n_days - 1) % 7 WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5 ELSE r.s6 END) / 100, 6) + 0.0 AS forecast_7d
      |FROM rec r JOIN nd n ON r.user_id = n.user_id AND r.i = n.n_days
      |ORDER BY r.user_id""".stripMargin

  /** The same GLOBAL 4-row trailing rolling mean twice over — declared
    * through [[graft.operators.MapOverlap]] instead of a window
    * function, locking the boundary-exchange operator's correctness
    * with a hash-matched oracle (the SQL twin is the plain windowed
    * form; the Spark side must agree across every range-partition
    * boundary, which is exactly what map_overlap's predecessor-tail
    * stitching is for). Arithmetic rides the cents lattice; the one
    * float division and HALF_UP round happen identically in both
    * engines. This is the API-parity showcase — a DECLARED rolling
    * stat should use the window twin ([[windowRollingRows]]); you
    * reach for map_overlap when the per-partition logic is genuinely
    * imperative.
    */
  def windowRollingMapOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, sfDir).events
      .select(col("event_id"), unix_micros(col("ts")).as("tus"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)]
    graft.operators.MapOverlap.mapOverlap(ev, numPartitions = 32,
        orderKey = struct(col("tus"), col("event_id")),
        before = 3, after = 0) { rows =>
      rows.indices.map { i =>
        val lo = math.max(0, i - 3)
        var s = 0L
        var j = lo
        while (j <= i) { s += rows(j)._3; j += 1 }
        val mean = s.toDouble / (i - lo + 1) / 100.0
        (rows(i)._1,
          BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble + 0.0)
      }
    }.toDF("event_id", "roll_mean").orderBy("event_id")
  }

  val windowRollingMapOverlapSql: String =
    """WITH t AS (
      |  SELECT event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events)
      |SELECT event_id,
      |  round(CAST(sum(cents) OVER w AS DOUBLE) / count(*) OVER w / 100.0, 6) + 0.0 AS roll_mean
      |FROM t
      |WINDOW w AS (ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin
}
