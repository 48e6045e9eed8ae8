package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables
import util._

/** Group-by / aggregation surface (SURVEY.md §2.4).
  *
  * All of these lower to Spark's partial->final `HashAggregateExec`
  * (map-side combine, then one shuffle on the group keys) — the same
  * tree-aggregation shape the reference's apply-concat-apply pattern
  * builds by hand. At 100 TB the only knobs that matter are the number
  * of shuffle partitions (harness-set) and AQE post-shuffle coalescing,
  * both config, not code.
  */
object Aggregations {

  /** Flagship: TPC-H-Q1-shaped pricing summary over lineitem.
    * scan -> filter (pushed to parquet) -> project (pruned) -> agg -> sort.
    */
  def aggBasic(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables(spark, sfDir).lineitem
    l.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // l_quantity is integral-valued: every partial sum is an exact
        // integer < 2^53, so the double sum is order-independent as-is
        round(sum("l_quantity"), 2).as("sum_qty"),
        // price/product sums are emitted at their EXACT decimal scale
        // (price 2dp; × discount 2dp -> 4dp; × tax 2dp -> 6dp): a
        // double sum rounded is order-dependent AND lands exactly on
        // .xx5 boundaries, which Spark (decimal-string) and DuckDB
        // (binary) round in opposite directions — the sql_q10 lesson.
        // The sfx100 sweep caught sum_base_price drifting 0.01 as a
        // round(sum(double)) at 6e8 rows; it now rides an exact integer
        // CENTS sum (price is exactly-2dp, so round(price·100) recovers
        // the integer cents both engines agree on — a primitive long
        // sum, cheaper than a third decimal(38,8) aggregate; headroom
        // 2e18 cents ≈ the full 100 TB row count before overflow)
        sum(round(col("l_extendedprice") * 100).cast("long")).as("__sbpc"),
        // dsumExact (scaled-bigint emission): a bare decimal→double cast
        // diverges by 1 ulp once value×10^scale > 2^53 (the sf1 sweep
        // caught sum_charge there — DuckDB double-rounds via int128)
        dsumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("sum_disc_price"),
        dsumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6)
          .as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        // exact cents → double (cents < 2^53 at any conceivable scale)
        (col("__sbpc").cast("double") / 100.0).as("sum_base_price"),
        col("sum_disc_price"), col("sum_charge"), col("avg_qty"),
        // avg off the EXACT sum: both engines then divide identical
        // doubles by identical counts — no per-engine accumulator drift
        round(col("__sbpc").cast("double") / 100.0
          / col("count_order").cast("double"), 4).as("avg_price"),
        col("avg_disc"), col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val aggBasicSql: String =
    s"""SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
      | ${util.dsumExactSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
      | ${util.dsumExactSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE), 4) AS avg_price,
      | round(avg(l_discount), 6) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Sample variance / stddev per group (Dask `.var()`/`.std()`, ddof=1). */
  def aggVarStd(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).customer
      .groupBy("c_mktsegment")
      .agg(
        round(var_samp(col("c_acctbal")), 4).as("var_bal"),
        round(stddev_samp(col("c_acctbal")), 4).as("std_bal"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  val aggVarStdSql: String =
    """SELECT c_mktsegment, round(var_samp(c_acctbal), 4) AS var_bal,
      | round(stddev_samp(c_acctbal), 4) AS std_bal, count(*) AS n
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** pandas/Dask `value_counts()` with `normalize=True` alongside: per
    * value of a low-cardinality column, descending count then value,
    * plus the share of total (exact decimal count ratio, one double
    * division).
    */
  def aggValueCounts(spark: SparkSession, sfDir: String): DataFrame = {
    // denominator comes from an empty-frame window over the grouped
    // result (|groups| rows, not the base table) so the whole query
    // stays one lazy plan — no eager d.count() at build time (ADVICE r6)
    val grouped = Tables(spark, sfDir).orders
      .groupBy(col("o_orderpriority").as("value"))
      .agg(count(lit(1)).as("n"))
    grouped
      .withColumn("share",
        round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy()), 6))
      .orderBy(col("n").desc, col("value"))
  }

  val aggValueCountsSql: String =
    """SELECT o_orderpriority AS value, count(*) AS n,
      | round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM orders), 6) AS share
      |FROM orders GROUP BY 1 ORDER BY n DESC, value""".stripMargin

  /** pandas/Dask `any()`/`all()` per group: boolean aggregates over
    * predicates (bool_and / bool_or exist under the same names in both
    * engines), plus the matching count so the flags are auditable.
    */
  def aggAnyAll(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .groupBy("event_type")
      .agg(
        bool_and(col("value") > 0.05).as("all_nontrivial"),
        bool_or(col("value") > 450.0).as("any_huge"),
        count(when(col("value") > 450.0, 1)).as("n_huge"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  val aggAnyAllSql: String =
    """SELECT event_type,
      | bool_and(value > 0.05) AS all_nontrivial,
      | bool_or(value > 450.0) AS any_huge,
      | count(CASE WHEN value > 450.0 THEN 1 END) AS n_huge,
      | count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Skewness and excess kurtosis from exact raw power sums. The
    * built-in `skewness`/`kurtosis` use different estimators in Spark
    * (population) and DuckDB (sample-adjusted), so both sides compute
    * the population moments from DECIMAL(38,8)-accumulated Σx..Σx⁴
    * (order-independent) with identical double expression shapes;
    * `v*sqrt(v)` replaces `pow(v,1.5)` because sqrt is correctly
    * rounded, pow is not.
    */
  def aggSkewKurt(spark: SparkSession, sfDir: String): DataFrame = {
    val x = col("l_quantity")
    Tables(spark, sfDir).lineitem
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x.cast("decimal(38,8)")).cast("double").as("s1"),
        sum((x * x).cast("decimal(38,8)")).cast("double").as("s2"),
        sum((x * x * x).cast("decimal(38,8)")).cast("double").as("s3"),
        sum((x * x * x * x).cast("decimal(38,8)")).cast("double").as("s4"))
      .withColumn("m", col("s1") / col("n"))
      .withColumn("v", col("s2") / col("n") - col("m") * col("m"))
      .select(
        col("l_returnflag"), col("n"),
        round(col("m"), 4).as("mean"),
        round(col("v"), 4).as("var_pop"),
        // + 0.0 normalizes -0.0 (a symmetric group's third moment can
        // round to negative zero in one engine only — the sf0.001
        // fixture produced exactly that repr split; r18 fix, the
        // windowRollingSkew device, a no-op for every other value)
        (round((col("s3") / col("n") - lit(3.0) * col("m") * col("s2") / col("n")
          + lit(2.0) * col("m") * col("m") * col("m"))
          / (col("v") * sqrt(col("v"))), 4) + lit(0.0)).as("skew"),
        (round((col("s4") / col("n") - lit(4.0) * col("m") * col("s3") / col("n")
          + lit(6.0) * col("m") * col("m") * col("s2") / col("n")
          - lit(3.0) * col("m") * col("m") * col("m") * col("m"))
          / (col("v") * col("v")) - lit(3.0), 4) + lit(0.0)).as("kurt_excess"))
      .orderBy("l_returnflag")
  }

  val aggSkewKurtSql: String =
    """WITH sums AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s2,
      |    CAST(sum(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s3,
      |    CAST(sum(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS s4
      |  FROM lineitem GROUP BY l_returnflag),
      |mom AS (
      |  SELECT l_returnflag, n, s1, s2, s3, s4,
      |    s1 / n AS m, s2 / n - (s1 / n) * (s1 / n) AS v
      |  FROM sums)
      |SELECT l_returnflag, n,
      |  round(m, 4) AS mean,
      |  round(v, 4) AS var_pop,
      |  round((s3 / n - 3.0 * m * s2 / n + 2.0 * m * m * m) / (v * sqrt(v)), 4) + 0.0 AS skew,
      |  round((s4 / n - 4.0 * m * s3 / n + 6.0 * m * m * s2 / n - 3.0 * m * m * m * m) / (v * v) - 3.0, 4) + 0.0 AS kurt_excess
      |FROM mom ORDER BY l_returnflag""".stripMargin

  /** Fixed-width histogram (pandas `cut` + `value_counts`): events.value
    * binned at width 25, per-bin count / exact-decimal mean / min / max.
    * `floor((x - lo) / w)` is the engine-portable binning form (DuckDB
    * has no width_bucket; Spark's and DuckDB's floor agree on doubles).
    */
  def aggHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val bin = floor(col("value") / 25.0).cast("long")
    Tables(spark, sfDir).events
      .groupBy(bin.as("bin"))
      .agg(
        count(lit(1)).as("n"),
        davg(col("value"), 4).as("mean_value"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"))
      .orderBy("bin")
  }

  val aggHistogramSql: String =
    s"""SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, count(*) AS n,
       | ${davgSql("value", 4)} AS mean_value,
       | round(min(value), 2) AS min_value,
       | round(max(value), 2) AS max_value
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** first/last made deterministic: value at the min/max of a UNIQUE
    * ordering key (min_by/max_by), never Spark's order-sensitive
    * `first()` (SURVEY.md §4.2).
    */
  def aggFirstlastBy(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .groupBy("o_custkey")
      .agg(
        min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("last_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  val aggFirstlastBySql: String =
    """SELECT o_custkey, min_by(o_totalprice, o_orderkey) AS first_price,
      | max_by(o_totalprice, o_orderkey) AS last_price, count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** nunique: exact distinct counts per group (the approx HLL++ variant
    * `approx_count_distinct` is exercised in ScalaTest — approx sketches
    * are not hash-stable across engines).
    */
  def aggCountDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val aggCountDistinctSql: String =
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
      | count(DISTINCT l_partkey) AS n_part, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact linear-interpolation percentiles (Dask `.quantile`). The
    * scale path is `percentile_approx` (t-digest-style sketch), verified
    * by error-bound ScalaTest, not by hash.
    */
  def aggQuantile(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).customer
      .groupBy("c_mktsegment")
      .agg(
        round(percentile(col("c_acctbal"), lit(0.5)), 4).as("p50"),
        round(percentile(col("c_acctbal"), lit(0.9)), 4).as("p90"))
      .orderBy("c_mktsegment")

  val aggQuantileSql: String =
    """SELECT c_mktsegment, round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
      | round(quantile_cont(c_acctbal, 0.9), 4) AS p90
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Pearson correlation and sample covariance per group. */
  def aggCorrCov(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"))
      .orderBy("l_returnflag")

  val aggCorrCovSql: String =
    """SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
      | round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Hierarchical subtotals via ROLLUP (Spark-native extension beyond the
    * Dask surface). Group keys coalesced so the subtotal rows sort
    * deterministically on both engines.
    */
  def aggRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  val aggRollupSql: String =
    s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       | coalesce(l_linestatus, '(all)') AS linestatus,
       | count(*) AS n, ${dsumSql("l_quantity", 2)} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  /** Heavy hitters via the SpaceSaving TypedImperativeAggregate
    * ([[org.apache.spark.sql.graft.HeavyHitters]]). event_type has 5
    * distinct values < capacity 10, so the sketch is exact here and the
    * plain GROUP BY count oracle hash-matches; capacity-pressure
    * behavior (superset guarantee, bounded error) is asserted in
    * HeavyHittersSpec.
    */
  def aggHeavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .agg(org.apache.spark.sql.graft.HeavyHitters
        .columnFor(col("event_type"), 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("event_type"), col("e.cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"))

  val aggHeavyHittersSql: String =
    """SELECT event_type, count(*) AS cnt FROM events
      |GROUP BY event_type ORDER BY cnt DESC, event_type""".stripMargin

  /** Arbitrary GROUPING SETS — the general form rollup/cube specialize
    * (SURVEY.md §2.4): one pass computes per-(flag,status) totals,
    * per-linenumber totals, and the grand total, expanded map-side and
    * aggregated in a single shuffle — NOT three scans unioned.
    * (Reference shape uses l_shipmode for the second set; this fixture
    * has no shipmode column, so l_linenumber stands in — cast to string
    * so the '(all)' sentinel types uniformly.)
    */
  def aggGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .withColumn("ln", col("l_linenumber").cast("string"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("ln")), Seq()),
        col("l_returnflag"), col("l_linestatus"), col("ln"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        coalesce(col("ln"), lit("(all)")).as("linenumber"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus", "linenumber")

  val aggGroupingSetsSql: String =
    s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       | coalesce(l_linestatus, '(all)') AS linestatus,
       | coalesce(CAST(l_linenumber AS VARCHAR), '(all)') AS linenumber,
       | count(*) AS n, ${dsumSql("l_quantity", 2)} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (CAST(l_linenumber AS VARCHAR)), ())
       |ORDER BY returnflag, linestatus, linenumber""".stripMargin

  /** CUBE: all 2^n grouping-set combinations (rollup's superset). */
  def aggCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy("status", "priority")

  val aggCubeSql: String =
    s"""SELECT coalesce(o_orderstatus, '(all)') AS status,
       | coalesce(o_orderpriority, '(all)') AS priority,
       | count(*) AS n, ${dsumSql("o_totalprice", 2)} AS sum_price
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY status, priority""".stripMargin

  private val DescribeCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  /** Dask/pandas `describe()` profile: count, mean, std, min,
    * p25/p50/p75, max per numeric column, long format (one row per
    * column). Moment statistics come out of ONE aggregation pass; the
    * exact quantiles come from [[graft.operators.ExactQuantiles]]
    * (distributed sort + global-offset selection) instead of Spark's
    * `percentile` aggregate — that buffer is a value→count map merged
    * on a single reducer, which is the column itself at 100 TB
    * cardinalities. Only the 3×8 final scalars touch the driver.
    */
  def aggDescribe(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.ExactQuantiles
    val li = Tables(spark, sfDir).lineitem
    val aggs = DescribeCols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__n"),
      davg(col(c), 4).as(s"${c}__mean"),
      round(stddev_samp(col(c)), 4).as(s"${c}__std"),
      round(min(col(c)), 4).as(s"${c}__min"),
      round(max(col(c)), 4).as(s"${c}__max"))
    }
    val row = li.agg(aggs.head, aggs.tail: _*).head()
    // Spark round() semantics on the driver (BigDecimal HALF_UP); the
    // quantiles of 2-decimal data at quarter points are 4-decimal-exact,
    // so this is an identity in practice
    def r4(d: Double): Double =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // one melt + one range shuffle + two jobs for ALL columns' exact
    // quantiles (quantilesMulti) — not a sort per column
    val allQs = ExactQuantiles.quantilesMulti(li, DescribeCols, Seq(0.25, 0.5, 0.75))
    val out = DescribeCols.map { c =>
      val qs = allQs(c)
      (c,
        row.getAs[Long](s"${c}__n"),
        row.getAs[Double](s"${c}__mean"),
        row.getAs[Double](s"${c}__std"),
        row.getAs[Double](s"${c}__min"),
        r4(qs(0)), r4(qs(1)), r4(qs(2)),
        row.getAs[Double](s"${c}__max"))
    }
    import spark.implicits._
    out.toDF("col_name", "n", "mean", "std", "min_val",
        "p25", "p50", "p75", "max_val")
      .orderBy("col_name")
  }

  val aggDescribeSql: String =
    DescribeCols.map(c =>
      s"""SELECT '$c' AS col_name, count($c) AS n, ${davgSql(c, 4)} AS mean,
         | round(stddev_samp($c), 4) AS std, round(min($c), 4) AS min_val,
         | round(quantile_cont($c, 0.25), 4) AS p25,
         | round(quantile_cont($c, 0.5), 4) AS p50,
         | round(quantile_cont($c, 0.75), 4) AS p75,
         | round(max($c), 4) AS max_val
         |FROM lineitem""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** groupBy().pivot() with an explicit value list (never pivot-on-
    * inferred-values at scale — that is an extra pass to discover the
    * domain).
    */
  def pivotEvents(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .withColumn("day", fmtDay(col("ts")))
      .groupBy("day")
      .pivot("event_type", Seq("click", "purchase", "error", "signup", "view"))
      .agg(dsum(col("value"), 2))
      .orderBy("day")

  val pivotEventsSql: String = {
    val cells = Seq("click", "purchase", "error", "signup", "view")
      .map(t => s"${dsumSql(s"CASE WHEN event_type = '$t' THEN value END", 2)} AS $t")
      .mkString(",\n ")
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
       | $cells
       |FROM events GROUP BY 1 ORDER BY day""".stripMargin
  }

  /** Per-group mode (most frequent value — pandas `groupby().agg(mode)`).
    * Built as count-then-rank rather than the built-in `mode()` because
    * both engines' built-ins break frequency ties arbitrarily; ranking
    * with an explicit (count desc, value asc) order makes the answer
    * deterministic and oracle-checkable. Cost: one partial-aggregated
    * groupBy (|distinct pairs| rows after map-side combine) plus a
    * window over the tiny counts frame — the scalable shape at any
    * corpus size, since the window input is bounded by the value domain,
    * not the row count.
    */
  def aggMode(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables(spark, sfDir).orders
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("n").desc, col("o_orderpriority").asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("n"))
      .orderBy("o_orderstatus")
  }

  val aggModeSql: String =
    """SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
      | SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  row_number() OVER (PARTITION BY o_orderstatus
      |                     ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
      | FROM orders GROUP BY o_orderstatus, o_orderpriority)
      |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin

  /** MERGEABLE distinct-count sketches (Apache DataSketches HLL via
    * Spark's native `hll_sketch_agg`/`hll_union_agg`) — the 100 TB
    * pattern for distinct counts: per-day sketches build with map-side
    * partial aggregation, then roll up to any coarser grain by sketch
    * UNION (associative + commutative) WITHOUT rescanning the fact
    * table — the `__total` row here re-aggregates the 30-odd daily
    * sketches, not 100 k events. Rows-only by design (sketch estimates
    * are engine-specific constants; DuckDB's approx_distinct uses a
    * different sketch); SketchSpec pins the error bound, exactness at
    * low cardinality, and merge-of-parts ≡ sketch-of-whole.
    */
  def aggDistinctSketch(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables(spark, sfDir).events
      .withColumn("day", fmtDay(col("ts")))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"), count(lit(1)).as("n"))
    val perDay = daily.select(col("day"),
      hll_sketch_estimate(col("sk")).as("est_distinct_users"), col("n"))
    val total = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_distinct_users"),
        sum(col("n")).as("n"))
      .withColumn("day", lit("__total"))
    perDay.unionByName(total.select("day", "est_distinct_users", "n"))
      .orderBy("day")
  }

  /** Mergeable KLL quantile sketch — the quantile sibling of
    * [[aggDistinctSketch]] (rows-only by design: estimates depend on
    * sketch internals; SketchSpec pins the ε(k) rank-error bound vs
    * exact quantiles and merge ≡ whole). Per-day p50/p90/p99 of
    * events.value, plus a `__total` row whose sketch is the UNION of
    * the ~30 daily sketches — the incremental-rollup pattern: global
    * percentiles without rescanning any event row.
    */
  def aggQuantileSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graft.KllQuantileSketch
    val ranks = Seq(0.5, 0.9, 0.99)
    val daily = Tables(spark, sfDir).events
      .withColumn("day", fmtDay(col("ts")))
      .groupBy("day")
      .agg(KllQuantileSketch.agg(col("value")).as("sk"), count(lit(1)).as("n"))
    def expand(df: DataFrame) = df.select(col("day"),
      round(element_at(col("q"), 1), 6).as("p50"),
      round(element_at(col("q"), 2), 6).as("p90"),
      round(element_at(col("q"), 3), 6).as("p99"), col("n"))
    val perDay = expand(daily.withColumn("q",
      KllQuantileSketch.quantiles(col("sk"), ranks)))
    val total = expand(daily
      .agg(KllQuantileSketch.unionAgg(col("sk")).as("sk"), sum("n").as("n"))
      .select(lit("__total").as("day"),
        KllQuantileSketch.quantiles(col("sk"), ranks).as("q"), col("n")))
    perDay.unionByName(total).orderBy("day")
  }

  /** Mergeable frequent-items sketch (DataSketches LongsSketch) — the
    * heavy-hitters sibling of [[aggDistinctSketch]]/[[aggQuantileSketch]],
    * completing the mergeable trio (rows-only by design: estimates
    * depend on Misra-Gries compaction internals; SketchSpec pins the
    * bounds-contain-truth and no-false-negative guarantees vs exact
    * counts). Top users per event type in ONE pass with fixed-size
    * map-side state, plus a `__total` row whose sketch is the UNION of
    * the per-type sketches — heavy hitters over the whole stream
    * without rescanning it; `agg_heavy_hitters` is the exact two-pass
    * counterpart that re-shuffles the corpus per refresh.
    */
  def aggFreqSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graft.FreqItemsSketch
    val byType = Tables(spark, sfDir).events
      .groupBy("event_type")
      .agg(FreqItemsSketch.agg(col("user_id")).as("sk"),
        count(lit(1)).as("n"))
    def expand(df: DataFrame) = df
      .select(col("event_type"), col("n"),
        posexplode(FreqItemsSketch.topK(col("sk"), 5)).as(Seq("rank", "t")))
      .select(col("event_type"), (col("rank") + 1).as("rank"),
        col("t.item").as("user_id"), col("t.est"), col("t.lb"), col("t.ub"),
        col("n"))
    val total = byType
      .agg(FreqItemsSketch.unionAgg(col("sk")).as("sk"), sum("n").as("n"))
      .select(lit("__total").as("event_type"), col("sk"), col("n"))
    expand(byType).unionByName(expand(total))
      .orderBy("event_type", "rank")
  }

  /** Columns of the pairwise correlation matrix, alphabetical — the
    * (col_a, col_b) upper triangle follows this order. All four are
    * exactly 2-decimal in the fixture, so ×100 lifts them to exact
    * BIGINTs (via decimal — a double ×100 can land on x.9999…).
    */
  private val corrMatrixCols =
    Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")

  /** Full pairwise `df.corr()` over lineitem's numeric columns in ONE
    * partial+final aggregation pass — the pandas/Dask method returns the
    * whole matrix, not one pair (SURVEY.md §2.4 `corr, cov`; the pair
    * form is `agg_corr_cov`).
    *
    * Scale story: 15 numeric aggregates (count + 4 sums + 10 product
    * sums) in a single map-side-combined HashAggregate over one scan —
    * no melt/self-join (which would shuffle the fact table ×k²/2), no
    * per-pair passes. The 6-row matrix then assembles from the single
    * reduced row via explode. All co-moments accumulate exactly: values
    * lift to integers ≤1e7, pair products ≤1e14 stay in BIGINT, sums in
    * DECIMAL(38,0); corr is formed from exact integer moments with one
    * double division (same discipline as the rolling-corr rework,
    * Windows.scala). round(…, 6) absorbs the one-vs-two-rounding
    * decimal→double difference between engines.
    */
  def aggCorrMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val k = corrMatrixCols.size
    def x(i: Int) = s"x$i"
    val lifted = Tables(spark, sfDir).lineitem.select(
      corrMatrixCols.zipWithIndex.map { case (c, i) =>
        (col(c).cast("decimal(18,2)") * 100).cast("long").as(x(i))
      }: _*)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      (0 until k).map(i => sum(col(x(i)).cast("decimal(38,0)")).as(s"s$i")) ++
      (for { i <- 0 until k; j <- i until k } yield
        sum((col(x(i)) * col(x(j))).cast("decimal(38,0)")).as(s"s${i}_$j"))
    val s = lifted.agg(aggs.head, aggs.tail: _*)
    def corrExpr(i: Int, j: Int) = {
      def den(a: Int) =
        sqrt((col(s"s${a}_$a") * col("n") - col(s"s$a") * col(s"s$a")).cast("double"))
      round((col(s"s${i}_$j") * col("n") - col(s"s$i") * col(s"s$j")).cast("double")
        / (den(i) * den(j)), 6)
    }
    val pairs = for { i <- 0 until k; j <- (i + 1) until k } yield
      struct(lit(corrMatrixCols(i)).as("col_a"),
        lit(corrMatrixCols(j)).as("col_b"),
        corrExpr(i, j).as("corr"))
    s.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.corr"))
      .orderBy("col_a", "col_b")
  }

  /** Full pairwise `df.cov()` over the same columns — the sibling of
    * [[aggCorrMatrix]] (pandas returns both; SURVEY.md §2.4 `corr, cov`),
    * from the IDENTICAL one-pass exact integer moments: sample
    * covariance `(n·s_ij − s_i·s_j) / (n(n−1))`, descaled by the ×100
    * lift on each side (÷10⁴). The matrix includes the diagonal
    * (variance), so i ≤ j — 10 rows.
    */
  def aggCovMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val k = corrMatrixCols.size
    def x(i: Int) = s"x$i"
    val lifted = Tables(spark, sfDir).lineitem.select(
      corrMatrixCols.zipWithIndex.map { case (c, i) =>
        (col(c).cast("decimal(18,2)") * 100).cast("long").as(x(i))
      }: _*)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      (0 until k).map(i => sum(col(x(i)).cast("decimal(38,0)")).as(s"s$i")) ++
      (for { i <- 0 until k; j <- i until k } yield
        sum((col(x(i)) * col(x(j))).cast("decimal(38,0)")).as(s"s${i}_$j"))
    val s = lifted.agg(aggs.head, aggs.tail: _*)
    // Exact scaled-BIGINT emission (the dsumExact discipline): cov at
    // sf1 magnitude (~9e8) has a double ulp of ~1.2e-7 — the SAME order
    // as the 1e-6 rounding grid, so a rounded-double column is
    // fundamentally beyond double precision and the round-9-style
    // cross-engine round() ulp split is guaranteed eventually (the sf1
    // sweep caught exactly that: one cell off by 1e-6). Emit instead
    // cov·10⁶ as an exact integer — numerator and denominator are exact
    // integers, and the round-half-away-from-zero happens in integer
    // space (abs + floor-div keeps Spark's truncating DIV and DuckDB's
    // flooring // in agreement), so both engines produce the identical
    // BIGINT. Headroom: |num|·10⁶ ≲ 3.2e34 at the sf10 proxy, inside
    // DECIMAL(38,0)/HUGEINT; the quotient ≈ 9e14 fits BIGINT.
    // the half-adjust is folded into a DOUBLED quotient —
    // (|num|·2·10⁶ + den) DIV (2·den) — because Spark's DIV emits
    // BIGINT: a standalone `den DIV 2` is ~1.8e19 at the sf10 proxy and
    // silently overflows long (caught by the sf10 sweep as ±1 cells);
    // in this form the only DIV output is the final ~9e14 quotient
    def covE6(i: Int, j: Int): Column = {
      val num = s"(s${i}_$j * n - s$i * s$j)"
      val den = s"(CAST(n AS DECIMAL(38,0)) * (n - 1) * 10000)"
      expr(s"CAST(CASE WHEN $num < 0 THEN -1 ELSE 1 END AS BIGINT) * " +
        s"CAST((abs($num) * 2000000 + $den) DIV (2 * $den) AS BIGINT)")
    }
    val pairs = for { i <- 0 until k; j <- i until k } yield
      struct(lit(corrMatrixCols(i)).as("col_a"),
        lit(corrMatrixCols(j)).as("col_b"),
        covE6(i, j).as("cov_e6"))
    s.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.cov_e6"))
      .orderBy("col_a", "col_b")
  }

  /** DuckDB twin of [[aggCovMatrix]] — same moment CTE as the corr twin,
    * sample-covariance branches incl. the diagonal.
    */
  val aggCovMatrixSql: String = {
    val k = corrMatrixCols.size
    val lifts = corrMatrixCols.zipWithIndex.map { case (c, i) =>
      s"CAST(CAST($c AS DECIMAL(18,2)) * 100 AS BIGINT) AS x$i"
    }.mkString(", ")
    val sums =
      (0 until k).map(i => s"sum(CAST(x$i AS DECIMAL(38,0))) AS s$i") ++
      (for { i <- 0 until k; j <- i until k } yield
        s"sum(CAST(x$i * x$j AS DECIMAL(38,0))) AS s${i}_$j")
    // exact HUGEINT mirror of the Spark side's DECIMAL(38,0) integer
    // rounding: abs + floor-division so // (floor) and DIV (truncate)
    // agree, half-away-from-zero via the +den/2 adjust
    def numD(i: Int, j: Int) =
      s"(CAST(s${i}_$j AS HUGEINT) * n - CAST(s$i AS HUGEINT) * CAST(s$j AS HUGEINT))"
    val denD = "(CAST(n AS HUGEINT) * (n - 1) * 10000)"
    val branches = for { i <- 0 until k; j <- i until k } yield
      s"""SELECT '${corrMatrixCols(i)}' AS col_a, '${corrMatrixCols(j)}' AS col_b,
         | CAST((CASE WHEN ${numD(i, j)} < 0 THEN -1 ELSE 1 END)
         |   * ((abs(${numD(i, j)}) * 2000000 + $denD) // (2 * $denD)) AS BIGINT) AS cov_e6
         |FROM s""".stripMargin
    s"""WITH m AS (SELECT $lifts FROM lineitem),
       |s AS (SELECT count(*) AS n, ${sums.mkString(", ")} FROM m)
       |${branches.mkString("\nUNION ALL\n")}
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** DuckDB twin of [[aggCorrMatrix]]: identical exact-integer moments;
    * the 6 output rows come from UNION ALL branches over the one-row
    * moment CTE (re-inlining the scan is fine at oracle scale).
    */
  val aggCorrMatrixSql: String = {
    val k = corrMatrixCols.size
    val lifts = corrMatrixCols.zipWithIndex.map { case (c, i) =>
      s"CAST(CAST($c AS DECIMAL(18,2)) * 100 AS BIGINT) AS x$i"
    }.mkString(", ")
    val sums =
      (0 until k).map(i => s"sum(CAST(x$i AS DECIMAL(38,0))) AS s$i") ++
      (for { i <- 0 until k; j <- i until k } yield
        s"sum(CAST(x$i * x$j AS DECIMAL(38,0))) AS s${i}_$j")
    def den(a: Int) = s"sqrt(CAST(s${a}_$a * n - s$a * s$a AS DOUBLE))"
    val branches = for { i <- 0 until k; j <- (i + 1) until k } yield
      s"""SELECT '${corrMatrixCols(i)}' AS col_a, '${corrMatrixCols(j)}' AS col_b,
         | round(CAST(s${i}_$j * n - s$i * s$j AS DOUBLE) / (${den(i)} * ${den(j)}), 6) AS corr
         |FROM s""".stripMargin
    s"""WITH m AS (SELECT $lifts FROM lineitem),
       |s AS (SELECT count(*) AS n, ${sums.mkString(", ")} FROM m)
       |${branches.mkString("\nUNION ALL\n")}
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** Incremental aggregate refresh — the mergeable-rollup maintenance
    * pattern: a stored BASE rollup (here: per-flag partials over
    * shipments before 1998) absorbs a DELTA batch (1998 onward) by
    * merging PARTIAL STATES — count adds, exact decimal sums add, mins
    * min, maxs max, and avg re-derives from the merged sum/count — so
    * the refresh touches O(groups) rollup rows plus the delta, never
    * rescanning the base fact table. At 100 TB this is the difference
    * between a nightly full scan and a seconds-long merge; correctness
    * is exactly the map-side-combine contract (merge(partials) ≡
    * aggregate(whole)), which the oracle pins by computing the same
    * result in ONE full-scan aggregate. The partial sums stay
    * DECIMAL(38,8) until after the merge — exact, so the split point
    * cannot leak into the result the way order-dependent double sums
    * would.
    */
  def aggIncrementalRefresh(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables(spark, sfDir).lineitem
    val cut = to_timestamp(lit("1998-01-01 00:00:00"))
    def partial(df: DataFrame): DataFrame = df
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(38,8)")).as("sum_qty"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"))
    val base = partial(li.filter(col("l_shipdate") < cut))
    val delta = partial(li.filter(col("l_shipdate") >= cut))
    base.unionByName(delta)
      .groupBy("l_returnflag")
      .agg(sum("n").as("n"),
        sum("sum_qty").as("merged_qty"),
        min("min_price").as("min_price"),
        max("max_price").as("max_price"))
      .select(col("l_returnflag"), col("n"),
        round(col("merged_qty").cast("double"), 2).as("sum_qty"),
        round(col("merged_qty").cast("double") / col("n"), 4).as("avg_qty"),
        col("min_price"), col("max_price"))
      .orderBy("l_returnflag")
  }

  /** Oracle: the same aggregate in ONE full scan — merged partials must
    * be indistinguishable from a recompute.
    */
  val aggIncrementalRefreshSql: String =
    """SELECT l_returnflag, count(*) AS n,
      | round(CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE), 2) AS sum_qty,
      | round(CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) / count(*), 4) AS avg_qty,
      | min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** Weighted median: the smallest l_extendedprice whose running
    * l_quantity mass reaches half the group's total — the
    * "median unit price weighted by units sold" statistic plain
    * `percentile` cannot express. One sorted window per group computes
    * the running mass, then the pick is a plain min-over-filter; no
    * second pass, no driver-side selection.
    *
    * Determinism discipline: quantities are integral doubles (fixture
    * audit), so the running mass is CAST TO BIGINT — an exact integer
    * cumsum immune to float add-order — and the half-total comparison
    * is `2*cum >= total` in integer space, never a double division.
    * The default RANGE window frame (sum includes ALL peers of a tied
    * price) is itself part of the determinism: with ROWS, tied prices
    * would make the running mass depend on tie order; with RANGE every
    * row of a tie group sees the same mass in BOTH engines.
    */
  def aggWeightedMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables(spark, sfDir).lineitem
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("bigint").as("w"))
    val cumW = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    val totW = Window.partitionBy("l_returnflag")
    l.withColumn("cum", sum("w").over(cumW))
      .withColumn("tot", sum("w").over(totW))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("weighted_median"),
        max("tot").as("total_weight"))
      .orderBy("l_returnflag")
  }

  /** General weighted quantiles — the [[aggWeightedMedian]] cumsum
    * device at arbitrary q, all quantiles in ONE pass: the same two
    * windows (running mass + group total) feed a single conditional
    * aggregate emitting min-value-reaching-q·total per quantile, so
    * p10/p50/p90 cost exactly what the median alone cost (no extra
    * shuffle, no per-q re-sort — the wide CASE aggregation replaces an
    * explode × quantile-table join).
    *
    * Determinism discipline: q is carried as a RATIONAL (num/den), so
    * the reach test is `cum · den >= num · tot` in exact BIGINT space —
    * never a double multiply whose rounding could flip a boundary row
    * in one engine only. Weights are integral doubles cast to BIGINT
    * (fixture audit), same as the median.
    */
  def weightedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, qs: Seq[(Int, Int, String)]): DataFrame = {
    val cumW = Window.partitionBy(groupCol).orderBy(valueCol)
    val totW = Window.partitionBy(groupCol)
    val base = df
      .withColumn("cum", sum(weightCol).over(cumW))
      .withColumn("tot", sum(weightCol).over(totW))
    base.groupBy(groupCol)
      .agg(max("tot").as("total_weight"),
        qs.map { case (num, den, name) =>
          min(when(col("cum") * den >= col("tot") * num, col(valueCol)))
            .as(name)
        }: _*)
      // put total_weight last for a stable, readable column order
      .select(col(groupCol) +: qs.map(q => col(q._3)) :+ col("total_weight"): _*)
  }

  /** Weighted p10/p50/p90 of unit price by quantity sold, per return
    * flag — the one-pass generalization the data-quality "weighted
    * p10/p90 spread" ask needs. p50 coincides with
    * [[aggWeightedMedian]] by construction (same reach rule).
    */
  def aggWeightedQuantile(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables(spark, sfDir).lineitem
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("bigint").as("w"))
    weightedQuantiles(l, "l_returnflag", "l_extendedprice", "w",
      Seq((1, 10, "w_p10"), (1, 2, "w_p50"), (9, 10, "w_p90")))
      .orderBy("l_returnflag")
  }

  val aggWeightedQuantileSql: String =
    """WITH m AS (
      |  SELECT l_returnflag, l_extendedprice,
      |   sum(CAST(l_quantity AS BIGINT)) OVER (
      |     PARTITION BY l_returnflag ORDER BY l_extendedprice) AS cum,
      |   sum(CAST(l_quantity AS BIGINT)) OVER (
      |     PARTITION BY l_returnflag) AS tot
      |  FROM lineitem)
      |SELECT l_returnflag,
      | min(CASE WHEN cum * 10 >= tot * 1 THEN l_extendedprice END) AS w_p10,
      | min(CASE WHEN cum * 2 >= tot * 1 THEN l_extendedprice END) AS w_p50,
      | min(CASE WHEN cum * 10 >= tot * 9 THEN l_extendedprice END) AS w_p90,
      | CAST(max(tot) AS BIGINT) AS total_weight
      |FROM m GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  val aggWeightedMedianSql: String =
    """WITH m AS (
      |  SELECT l_returnflag, l_extendedprice,
      |   sum(CAST(l_quantity AS BIGINT)) OVER (
      |     PARTITION BY l_returnflag ORDER BY l_extendedprice) AS cum,
      |   sum(CAST(l_quantity AS BIGINT)) OVER (
      |     PARTITION BY l_returnflag) AS tot
      |  FROM lineitem)
      |SELECT l_returnflag, min(l_extendedprice) AS weighted_median,
      | CAST(max(tot) AS BIGINT) AS total_weight
      |FROM m WHERE cum * 2 >= tot
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** pandas `groupby('user_id').value.idxmax()`: the row LABEL
    * (event_id) holding each group's maximum, ties to the smallest
    * label (pandas keeps the first; on a distributed engine "first"
    * must be a total order, so the tie rule is pinned explicitly).
    * ONE map-side-combinable aggregate — max over the packed
    * (cents, −event_id) struct — not a rank window: the window
    * phrasing sorts and shuffles every row to discard all but one per
    * group, where the struct-max combines partials (the same plan
    * argument as `merge_cdc_apply`'s LWW fold). Cents are exact
    * BIGINTs of the 2-decimal fixture, so the struct comparison is
    * pure integer ordering; the emitted max value is cents/100 — one
    * double division, identical operands both engines.
    */
  def aggIdxmax(spark: SparkSession, sfDir: String): DataFrame = {
    val xc = round(col("value") * 100).cast("long")
    Tables(spark, sfDir).events
      .select(col("user_id"), struct(xc.as("xc"),
        (-col("event_id")).as("neg")).as("p"))
      .groupBy("user_id").agg(max(col("p")).as("m"))
      .select(col("user_id"), (-col("m.neg")).as("idx_max"),
        (col("m.xc").cast("double") / 100.0).as("max_value"))
      .orderBy("user_id")
  }

  val aggIdxmaxSql: String =
    """WITH r AS (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY round(value * 100) DESC, event_id) AS rn
      |  FROM events)
      |SELECT user_id, event_id AS idx_max,
      |  CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) / 100.0 AS max_value
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Per-group OLS fit (`groupby().apply(lambda g: linregress(...))` in
    * pandas-land): slope/intercept of extendedprice-vs-quantity per
    * (returnflag, linestatus), as closed-form moments — ONE
    * map-side-combinable pass over the fact table (n, Σx, Σy, Σxy, Σx²),
    * never a per-group collect or a model-library detour. This is the
    * 100 TB shape for "fit a line per segment": the shuffle carries five
    * numbers per group.
    *
    * Determinism: x is the integral quantity as BIGINT, y is exact
    * cents via the DECIMAL(18,2) cast; all five moments are exact
    * integers (per-row x·y ≤ 5.25e8 stays in int64; the sums ride
    * DECIMAL(38,0) / HUGEINT so n·Σxy ≈ 5e22 at the 100× proxy never
    * truncates). slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) casts the two
    * EXACT products to double for one division; the intercept reuses
    * the unrounded slope in the identical expression tree both engines
    * evaluate. Degenerate groups (all x equal ⇒ den = 0) cannot occur
    * on this fixture; the operator would emit NULL there, loudly
    * visible in the oracle compare.
    */
  def aggGroupOls(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables(spark, sfDir).lineitem
    val pre = l.select(col("l_returnflag"), col("l_linestatus"),
      col("l_quantity").cast("long").as("x"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("y"))
    val s = pre.groupBy("l_returnflag", "l_linestatus").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
    val nD = col("n").cast("decimal(38,0)")
    val sxD = col("sx").cast("decimal(38,0)")
    val num = (nD * col("sxy") - sxD * col("sy")).cast("double")
    val den = (nD * col("sxx") - sxD * sxD).cast("double")
    val slope = num / den
    val xbar = col("sx").cast("double") / col("n").cast("double")
    val ybar = col("sy").cast("double") / col("n").cast("double")
    s.select(col("l_returnflag"), col("l_linestatus"), col("n"),
        round(slope / 100.0, 6).as("slope"),
        round((ybar - slope * xbar) / 100.0, 6).as("intercept"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val aggGroupOlsSql: String =
    """WITH s AS (
      |  SELECT l_returnflag, l_linestatus, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sy,
      |    sum(CAST(l_quantity AS BIGINT)
      |      * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sxy,
      |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, l_linestatus, n,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6) AS slope,
      |  round((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      |    - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
      |      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0, 6) AS intercept
      |FROM s ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Incremental aggregate maintenance under a FULL I/U/D CDC log — the
    * piece [[aggIncrementalRefresh]] (append-only partial merge) cannot
    * express: deletes and updates must SUBTRACT. The textbook
    * signed-contribution device: every CDC record explodes into ≤ 2
    * signed rows against the maintained group —
    * I → (+1, +after); D → (−1, −before); U → (−1, −before) on the OLD
    * group and (+1, +after) on the NEW group (so group-moving updates
    * need no special case) — and the refresh is base partials ∪ signed
    * rows through ONE keyed aggregate. The log is never joined to the
    * base table and the base is never rescanned: the exchange carries
    * |groups| + O(log) rows whatever the base size, which is the whole
    * point at 100 TB. Count and sum (and so avg) are self-maintainable;
    * min/max are NOT under deletes (a deleted minimum forces a
    * per-group rescan) — deliberately absent, documented here. The CDC
    * log carries before/after images (the Debezium envelope), which is
    * what makes U a pure delta without reading the base. Exactness:
    * measures ride exact cents BIGINTs; counts are exact; avg is one
    * double division at the end.
    */
  def aggRefreshCdc(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables(spark, sfDir).customer
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    // deterministic Debezium-shaped log: op, key, group/measure images
    val del = c.filter(col("c_custkey") % 13 === 0)
      .select(lit("D").as("op"), col("c_custkey"),
        col("c_mktsegment").as("g_before"), col("cents").as("v_before"),
        lit(null).cast("string").as("g_after"),
        lit(null).cast("long").as("v_after"))
    val upd = c.filter(col("c_custkey") % 13 =!= 0 && col("c_custkey") % 11 === 0)
      .select(lit("U").as("op"), col("c_custkey"),
        col("c_mktsegment").as("g_before"), col("cents").as("v_before"),
        // every 3rd update also MOVES the row to another segment
        when(col("c_custkey") % 3 === 0, lit("MACHINERY"))
          .otherwise(col("c_mktsegment")).as("g_after"),
        (col("cents") + 5000L).as("v_after"))
    // the insert-key offset keeps synthetic keys out of the existing
    // domain up through sf100k (10^12 vs lineitem's ~10^10 keys at
    // sf100k; the r14 +10^7 collided with real c_custkey at sf100).
    // The aggregate itself never reads the key — the offset exists only
    // so the log is a WELL-FORMED Debezium envelope (no duplicate-key
    // inserts) at every fixture scale.
    val ins = c.filter(col("c_custkey") % 17 === 0)
      .select(lit("I").as("op"), (col("c_custkey") + 1000000000000L).as("c_custkey"),
        lit(null).cast("string").as("g_before"),
        lit(null).cast("long").as("v_before"),
        col("c_mktsegment").as("g_after"), (col("cents") + 1000L).as("v_after"))
    val log = del.unionByName(upd).unionByName(ins)
    // signed contribution rows: -(before) where present, +(after) where
    // present; a same-group U contributes both and nets the delta
    val signed = log
      .select(col("g_before").as("g"), lit(-1L).as("dn"),
        (-col("v_before")).as("dv"))
      .unionByName(log.select(col("g_after").as("g"), lit(1L).as("dn"),
        col("v_after").as("dv")))
      .filter(col("g").isNotNull)
    val base = c.groupBy(col("c_mktsegment").as("g"))
      .agg(count(lit(1)).as("dn"), sum("cents").as("dv"))
    base.unionByName(signed)
      .groupBy("g")
      .agg(sum("dn").as("n"), sum("dv").as("sum_cents"))
      .select(col("g").as("c_mktsegment"), col("n"),
        (col("sum_cents").cast("double") / lit(100.0)).as("sum_bal"),
        round(col("sum_cents").cast("double") / (col("n") * 100).cast("double"), 4)
          .as("avg_bal"))
      .orderBy("c_mktsegment")
  }

  /** pandas `groupby().filter(lambda g: len(g) >= k)` — keep the ROWS
    * of groups meeting a group-level predicate (here: orders of
    * customers with ≥ 12 orders). One windowed count over the group
    * key — a single keyed exchange and no join; the aggregate+semi-join
    * phrasing would shuffle the table twice. The predicate column rides
    * along in the output (pandas keeps it computable, we keep it
    * visible).
    */
  def aggGroupFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    Tables(spark, sfDir).orders
      .withColumn("n_orders", count(lit(1)).over(w))
      .filter(col("n_orders") >= 12)
      .select(col("o_orderkey"), col("o_custkey"), col("n_orders"),
        col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  val aggGroupFilterSql: String =
    """SELECT o_orderkey, o_custkey, n_orders, o_totalprice FROM (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    count(*) OVER (PARTITION BY o_custkey) AS n_orders
      |  FROM orders)
      |WHERE n_orders >= 12
      |ORDER BY o_orderkey""".stripMargin

  /** Oracle: apply the same CDC to the base table OUTRIGHT and
    * recompute — the maintained aggregate must be indistinguishable
    * from the rebuild.
    */
  val aggRefreshCdcSql: String =
    """WITH applied AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 11 = 0 AND c_custkey % 3 = 0 THEN 'MACHINERY'
      |         ELSE c_mktsegment END AS g,
      |    CAST(round(c_acctbal * 100) AS BIGINT)
      |      + CASE WHEN c_custkey % 11 = 0 THEN 5000 ELSE 0 END AS cents
      |  FROM customer WHERE c_custkey % 13 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000000000, c_mktsegment,
      |    CAST(round(c_acctbal * 100) AS BIGINT) + 1000
      |  FROM customer WHERE c_custkey % 17 = 0)
      |SELECT g AS c_mktsegment, count(*) AS n,
      |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0 AS sum_bal,
      |  round(CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
      |        / CAST(count(*) * 100 AS DOUBLE), 4) AS avg_bal
      |FROM applied GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  /** Distribution-concentration profile per group — Shannon entropy and
    * the Herfindahl index of each nation's market-segment mix (the
    * class-balance diagnostic a mixture designer reads next to
    * [[graft.queries.TrainPrep.dqLabelBalance]]). Two keyed aggregates
    * over COUNTS, never over rows twice: (nation, segment) → exact n,
    * then per nation. HHI is exact integer arithmetic to the last step
    * (Σnᵢ² / N² — one double division). Entropy needs Σ p·ln p, a
    * DOUBLE sum whose value depends on ADDITION ORDER — a plain
    * aggregate would sum in partition-arrival order and break
    * hash-parity — so the per-nation counts (≤ 5 segments) collect into
    * a SORTED array and the entropy folds over it left-to-right: one
    * deterministic float sequence, identical in both engines. The
    * collect is bounded by the segment vocabulary, not the row count.
    */
  def aggEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    val counts = t.customer
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "c_mktsegment")
      .agg(count(lit(1)).as("n"))
    counts.groupBy("n_name")
      .agg(sum("n").as("total"), sum(col("n") * col("n")).as("sum_sq"),
        array_sort(collect_list(col("n"))).as("ns"))
      .select(col("n_name"),
        col("total").as("n_customers"),
        round(-aggregate(col("ns"), lit(0.0),
          (acc, x) => acc + (x.cast("double") / col("total").cast("double")) *
            log(x.cast("double") / col("total").cast("double"))), 6)
          .as("entropy"),
        round(col("sum_sq").cast("double") /
          (col("total") * col("total")).cast("double"), 6).as("hhi"))
      .orderBy("n_name")
  }

  val aggEntropySql: String =
    """WITH c AS (
      |  SELECT n.n_name, c.c_mktsegment, count(*) AS n
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT n_name, sum(n) AS total, sum(n * n) AS sum_sq,
      |    list_sort(list(n)) AS ns
      |  FROM c GROUP BY 1)
      |SELECT n_name, CAST(total AS BIGINT) AS n_customers,
      |  round(-list_aggregate(list_transform(ns,
      |    x -> (CAST(x AS DOUBLE) / CAST(total AS DOUBLE))
      |         * ln(CAST(x AS DOUBLE) / CAST(total AS DOUBLE))), 'sum'), 6) AS entropy,
      |  round(CAST(sum_sq AS DOUBLE) / CAST(total * total AS DOUBLE), 6) AS hhi
      |FROM g ORDER BY n_name""".stripMargin

  /** Gini coefficient of account balance per market segment — the
    * inequality summary (data-mixture audits read it over tokens-per-
    * source). Rank formulation over the ASCENDING sort:
    * G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx), i = 1..n — one rank window
    * (row_number; ties contribute identically whatever their relative
    * order, since equal x swap freely in Σ i·xᵢ) + one aggregate, a
    * single keyed exchange. Balances shift to NON-NEGATIVE cents
    * (c_acctbal ≥ −999.99 by TPC-H domain; +100 000 cents) so the
    * denominator is positive and the quotient well-defined; every term
    * is an exact BIGINT (|2Σi·x| ≤ n²·maxx ≈ 10¹⁸ at 30 M rows/segment
    * — past that the two sums ride DECIMAL(38,0) unchanged), one final
    * double division.
    */
  def aggGini(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("cents"), col("c_custkey"))
    Tables(spark, sfDir).customer
      .select(col("c_mktsegment"), col("c_custkey"),
        (round(col("c_acctbal") * 100).cast("long") + 100000L).as("cents"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("cents").as("sx"),
        sum(col("i") * col("cents")).as("six"))
      .select(col("c_mktsegment"), col("n"),
        round((lit(2L) * col("six") - (col("n") + 1L) * col("sx"))
          .cast("double") / (col("n") * col("sx")).cast("double"), 6)
          .as("gini"))
      .orderBy("c_mktsegment")
  }

  val aggGiniSql: String =
    """WITH r AS (
      |  SELECT c_mktsegment,
      |    CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS cents,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) + 100000, c_custkey) AS i
      |  FROM customer),
      |s AS (
      |  SELECT c_mktsegment, count(*) AS n, sum(cents) AS sx,
      |    sum(i * cents) AS six
      |  FROM r GROUP BY 1)
      |SELECT c_mktsegment, n,
      |  round(CAST(2 * six - (n + 1) * sx AS DOUBLE)
      |        / CAST(n * sx AS DOUBLE), 6) AS gini
      |FROM s ORDER BY c_mktsegment""".stripMargin

  /** Median absolute deviation per group (the robust spread pandas
    * users reach for when [[aggVarStd]] is skew-poisoned): discrete
    * 'lower' medians (index ⌊(n−1)/2⌋, 0-based — an observed value, so
    * exact cents end-to-end, no even-count interpolation). Two
    * rank-window passes, NEVER a per-group collect: median₁ = the value
    * at the target rank of (segment, cents) order — a 5-row frame
    * broadcast back — then MAD = the value at the target rank of
    * (segment, |cents − median₁|) order. Each pass is one keyed
    * exchange; group size never materializes anywhere (the
    * [[graft.operators.ExactQuantiles]] argument applied to the
    * windowed formulation).
    */
  def aggMad(spark: SparkSession, sfDir: String): DataFrame = {
    def rankMedian(df: DataFrame, valueCol: String, tieCol: String): DataFrame = {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col(valueCol), col(tieCol))
      val wc = Window.partitionBy("c_mktsegment")
      df.withColumn("i", row_number().over(w).cast("long"))
        .withColumn("nn", count(lit(1)).over(wc))
        // integer floor division — Column./ is DOUBLE division, which
        // would drop every even-count group on the .5 comparison
        .filter(col("i") === expr("(nn - 1) DIV 2 + 1"))
        .select(col("c_mktsegment"), col(valueCol).as("med"), col("nn").as("n"))
    }
    val c = Tables(spark, sfDir).customer
      .select(col("c_mktsegment"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    val med1 = rankMedian(c, "cents", "c_custkey")
    val dev = c.join(broadcast(med1.select(col("c_mktsegment"), col("med"))),
        Seq("c_mktsegment"))
      .select(col("c_mktsegment"), col("c_custkey"),
        abs(col("cents") - col("med")).as("adev"))
    rankMedian(dev, "adev", "c_custkey")
      .select(col("c_mktsegment"), col("n"),
        (col("med").cast("double") / 100.0).as("mad"))
      .orderBy("c_mktsegment")
  }

  val aggMadSql: String =
    """WITH c AS (
      |  SELECT c_mktsegment, c_custkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer),
      |m1 AS (
      |  SELECT c_mktsegment, cents AS med FROM (
      |    SELECT c_mktsegment, cents,
      |      row_number() OVER (PARTITION BY c_mktsegment ORDER BY cents, c_custkey) AS i,
      |      count(*) OVER (PARTITION BY c_mktsegment) AS nn
      |    FROM c)
      |  WHERE i = (nn - 1) // 2 + 1),
      |d AS (
      |  SELECT c.c_mktsegment, c.c_custkey, abs(c.cents - m1.med) AS adev
      |  FROM c JOIN m1 USING (c_mktsegment))
      |SELECT c_mktsegment, nn AS n, CAST(adev AS DOUBLE) / 100.0 AS mad FROM (
      |  SELECT c_mktsegment, adev,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY adev, c_custkey) AS i,
      |    count(*) OVER (PARTITION BY c_mktsegment) AS nn
      |  FROM d)
      |WHERE i = (nn - 1) // 2 + 1
      |ORDER BY c_mktsegment""".stripMargin

  /** pandas `crosstab(nation, segment, normalize='index')` — the
    * contingency table with row shares. One keyed count aggregate,
    * then the segment vocabulary (5 values, fixed) pivots as
    * conditional sums in the SAME second aggregate — never a join, and
    * shares stay EXACT integer ppm (floor n·10⁶/total; doubles never
    * appear, so there is nothing to drift). The generic-pivot variant
    * is [[pivotEvents]]; this row is the normalized-crosstab semantics.
    */
  def aggCrosstabPct(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val counts = t.customer
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "c_mktsegment")
      .agg(count(lit(1)).as("n"))
    counts.groupBy("n_name")
      .agg(sum("n").as("total"),
        segs.map(s => sum(when(col("c_mktsegment") === s, col("n"))
          .otherwise(0L)).as(s"n_$s")): _*)
      .select(col("n_name") +: col("total") +:
        segs.map(s => expr(s"n_$s * 1000000 DIV total")
          .as(s"ppm_${s.toLowerCase(java.util.Locale.ROOT)}")): _*)
      .orderBy("n_name")
  }

  val aggCrosstabPctSql: String =
    """WITH c AS (
      |  SELECT n.n_name, cu.c_mktsegment, count(*) AS n
      |  FROM customer cu JOIN nation n ON cu.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT n_name, CAST(sum(n) AS BIGINT) AS total,
      |    CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN n ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN n ELSE 0 END) AS BIGINT) AS nb,
      |    CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN n ELSE 0 END) AS BIGINT) AS nf,
      |    CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN n ELSE 0 END) AS BIGINT) AS nh,
      |    CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN n ELSE 0 END) AS BIGINT) AS nm
      |  FROM c GROUP BY 1)
      |SELECT n_name, total,
      |  na * 1000000 // total AS ppm_automobile,
      |  nb * 1000000 // total AS ppm_building,
      |  nf * 1000000 // total AS ppm_furniture,
      |  nh * 1000000 // total AS ppm_household,
      |  nm * 1000000 // total AS ppm_machinery
      |FROM g ORDER BY n_name""".stripMargin

  /** pandas `pivot_table(..., margins=True)` — the pivot with an "All"
    * row and an "All" column. Rows ride `rollup(event_type)` (the
    * grand-total row is the rollup's null group, relabeled 'All');
    * columns are the 7-day weekday vocabulary as conditional exact-cent
    * sums inside the SAME aggregate, with the row-margin column one
    * more unconditional sum — ONE keyed exchange, no join, no second
    * pass for the margins (a pivot-then-union-totals phrasing rescans).
    */
  def aggPivotMargins(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    val dow = (dayofweek(col("ts")) - 1).cast("int") // 0 = Sunday
    val cols = (0 to 6).map(d =>
      sum(when(col("dow") === d, col("cents")).otherwise(0L))
        .as(s"d$d"))
    Tables(spark, sfDir).events
      .select(col("event_type"), dow.as("dow"), cents.as("cents"))
      .rollup("event_type")
      .agg(cols.head, cols.tail :+ sum(col("cents")).as("all_c"): _*)
      .select(coalesce(col("event_type"), lit("All")).as("event_type") +:
        (0 to 6).map(d => (col(s"d$d").cast("double") / 100.0).as(s"dow_$d")) :+
        (col("all_c").cast("double") / 100.0).as("all_days"): _*)
      .orderBy("event_type")
  }

  val aggPivotMarginsSql: String = {
    val conds = (0 to 6).map(d =>
      s"CAST(CAST(sum(CASE WHEN dayofweek(ts) = $d THEN cents ELSE 0 END) AS BIGINT) AS DOUBLE) / 100.0 AS dow_$d")
      .mkString(",\n      |  ")
    s"""SELECT coalesce(event_type, 'All') AS event_type,
       |  $conds,
       |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0 AS all_days
       |FROM (SELECT event_type, ts,
       |        CAST(round(value * 100) AS BIGINT) AS cents FROM events)
       |GROUP BY ROLLUP (event_type) ORDER BY event_type""".stripMargin
  }

  /** pandas `df.groupby(g).corrwith(target)` — the correlation of EACH
    * feature column with one target series, per group: the one-column
    * slice of [[aggCorrMatrix]] (a user asks "which features track
    * value?" far more often than for the full k² matrix). Same
    * discipline: ONE aggregate carries the exact integer co-moments of
    * (target, every feature) — the table is scanned once and shuffled
    * once at COUNT level regardless of feature count — then the k corr
    * cells unpivot via explode into (group, feature, corr) rows.
    * Features here are deterministic event attributes (id residues +
    * clock hour) so the oracle is replayable; target is value cents.
    * Headroom: hour ≤ 23, residues ≤ 96, cents ≤ 5.7e6 → every product
    * ≤ 5.5e8/row, DECIMAL(38,0) sums are exact past 10²⁸ rows.
    */
  def aggCorrwith(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = Seq("m97", "m31", "hr")
    val t = Tables(spark, sfDir).events.select(
      col("event_type"),
      round(col("value") * 100).cast("long").as("y"),
      pmod(col("event_id"), lit(97L)).as("m97"),
      pmod(col("event_id"), lit(31L)).as("m31"),
      hour(col("ts")).cast("long").as("hr"))
    val aggs =
      Seq(count(lit(1)).as("n"), sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy")) ++
      feats.flatMap { f =>
        Seq(sum(col(f).cast("decimal(38,0)")).as(s"s_$f"),
          sum((col(f) * col(f)).cast("decimal(38,0)")).as(s"s_${f}_$f"),
          sum((col("y") * col(f)).cast("decimal(38,0)")).as(s"s_y_$f"))
      }
    val s = t.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    def corrOf(f: String) = {
      val num = (col(s"s_y_$f") * col("n") - col("sy") * col(s"s_$f"))
        .cast("double")
      val dy = sqrt((col("syy") * col("n") - col("sy") * col("sy")).cast("double"))
      val df2 = sqrt((col(s"s_${f}_$f") * col("n") - col(s"s_$f") * col(s"s_$f")).cast("double"))
      round(num / (dy * df2), 6) + lit(0.0)
    }
    val cells = feats.map(f =>
      struct(lit(f).as("feature"), corrOf(f).as("corr_with_value")))
    s.select(col("event_type"), explode(array(cells: _*)).as("c"))
      .select(col("event_type"), col("c.feature"), col("c.corr_with_value"))
      .orderBy("event_type", "feature")
  }

  /** Weighted group mean — `Σw·x / Σw` with quantity weights, the
    * single most-asked "groupby.apply" pandas recipe (there is no
    * built-in `weighted_mean` aggregate in pandas OR Spark — both make
    * users compose it; here it is one map-side-combinable aggregate of
    * two exact integer sums, never an apply). Numerator rides
    * DECIMAL(38,0) (qty·price_cents ≤ 5.5e8/row — int64 holds to
    * ~1.6e10 rows but the decimal costs nothing and removes the
    * ceiling); ONE double division at the end.
    */
  def aggWeightedMean(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("w"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"))
      .groupBy("l_returnflag")
      .agg(sum(col("w")).as("sum_w"),
        sum((col("w") * col("pc")).cast("decimal(38,0)")).as("swx"))
      .select(col("l_returnflag"), col("sum_w"),
        round(col("swx").cast("double") / col("sum_w").cast("double") / 100.0, 4)
          .as("weighted_avg_price"))
      .orderBy("l_returnflag")

  val aggWeightedMeanSql: String =
    """SELECT l_returnflag, CAST(sum(w) AS BIGINT) AS sum_w,
      |  round(CAST(sum(CAST(w * pc AS DECIMAL(38,0))) AS DOUBLE)
      |        / CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) / 100.0, 4) AS weighted_avg_price
      |FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS w,
      |        CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
      |      FROM lineitem)
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** pandas `groupby().agg('|'.join)` — ordered string concatenation
    * per group. Unbounded concat is an anti-pattern at scale (a hot
    * group's string is a single-row memory bomb), so the group is
    * CAPPED first: the 5 lowest-custkey names per segment survive a
    * rank window, then concatenate in sorted order — Spark sorts the
    * collected array (`array_sort ∘ collect_list`, making the
    * unordered collect deterministic), DuckDB orders inside
    * `string_agg`. The cap also bounds the window's per-group state;
    * the output is 5 rows.
    */
  def aggStringJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment").orderBy("c_custkey")
    Tables(spark, sfDir).customer
      .select(col("c_mktsegment"), col("c_custkey"), col("c_name"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        concat_ws("|", array_sort(collect_list(col("c_name")))).as("names"))
      .orderBy("c_mktsegment")
  }

  val aggStringJoinSql: String =
    """WITH capped AS (
      |  SELECT c_mktsegment, c_name FROM (
      |    SELECT c_mktsegment, c_name,
      |      row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn
      |    FROM customer)
      |  WHERE rn <= 5)
      |SELECT c_mktsegment, count(*) AS n,
      |  string_agg(c_name, '|' ORDER BY c_name) AS names
      |FROM capped GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  /** Welch's two-sample t — the A/B-test read every experimentation
    * pipeline runs: treatment = even user_id, control = odd (a
    * deterministic assignment the oracle can replay), compared per
    * event_type on value cents. ONE aggregate carries both cohorts'
    * exact (n, S1, S2) via conditional sums — the log is scanned once
    * and shuffled at COUNT level, never split into two jobs; the t
    * statistic `(μ_t − μ_c)/√(v_t/n_t + v_c/n_c)` enters floating
    * point through one identical operation sequence from the six
    * exact integers.
    */
  def aggAbTtest(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir).events.select(
      col("event_type"),
      (col("user_id") % 2 === 0).as("treat"),
      round(col("value") * 100).cast("long").as("xc"))
    def side(p: Column, tag: String) = Seq(
      sum(when(p, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(p, col("xc")).otherwise(0L).cast("decimal(38,0)")).as(s"s1_$tag"),
      sum(when(p, col("xc") * col("xc")).otherwise(0L).cast("decimal(38,0)")).as(s"s2_$tag"))
    val agg = t.groupBy("event_type")
      .agg((side(col("treat"), "t") ++ side(!col("treat"), "c")).head,
        (side(col("treat"), "t") ++ side(!col("treat"), "c")).tail: _*)
    def mean(tag: String) =
      col(s"s1_$tag").cast("double") / col(s"n_$tag").cast("double") / 100.0
    def varOverN(tag: String) = {
      val n = col(s"n_$tag")
      (n * col(s"s2_$tag") - col(s"s1_$tag") * col(s"s1_$tag")).cast("double") /
        ((n * (n - 1)).cast("double") * lit(10000.0)) / n.cast("double")
    }
    agg.filter(col("n_t") >= 2 && col("n_c") >= 2)
      .select(col("event_type"), col("n_t"), col("n_c"),
        round(mean("t") - mean("c"), 4).as("mean_diff"),
        round((mean("t") - mean("c")) /
          sqrt(varOverN("t") + varOverN("c")), 4).as("t_welch"))
      .orderBy("event_type")
  }

  val aggAbTtestSql: String = {
    def mean(tag: String) =
      s"(CAST(s1_$tag AS DOUBLE) / CAST(n_$tag AS DOUBLE) / 100.0)"
    def vOverN(tag: String) =
      s"(CAST(n_$tag * s2_$tag - s1_$tag * s1_$tag AS DOUBLE)" +
        s" / (CAST(n_$tag * (n_$tag - 1) AS DOUBLE) * 10000.0) / CAST(n_$tag AS DOUBLE))"
    s"""WITH b AS (
       |  SELECT event_type, user_id % 2 = 0 AS treat,
       |    CAST(round(value * 100) AS BIGINT) AS xc
       |  FROM events),
       |s AS (
       |  SELECT event_type,
       |    CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
       |    sum(CAST(CASE WHEN treat THEN xc ELSE 0 END AS DECIMAL(38,0))) AS s1_t,
       |    sum(CAST(CASE WHEN treat THEN xc * xc ELSE 0 END AS DECIMAL(38,0))) AS s2_t,
       |    CAST(sum(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
       |    sum(CAST(CASE WHEN NOT treat THEN xc ELSE 0 END AS DECIMAL(38,0))) AS s1_c,
       |    sum(CAST(CASE WHEN NOT treat THEN xc * xc ELSE 0 END AS DECIMAL(38,0))) AS s2_c
       |  FROM b GROUP BY 1)
       |SELECT event_type, n_t, n_c,
       |  round(${mean("t")} - ${mean("c")}, 4) AS mean_diff,
       |  round((${mean("t")} - ${mean("c")})
       |        / sqrt(${vOverN("t")} + ${vOverN("c")}), 4) AS t_welch
       |FROM s WHERE n_t >= 2 AND n_c >= 2
       |ORDER BY event_type""".stripMargin
  }

  /** One-way ANOVA F — "does mean value differ across event types",
    * the k-group generalization of [[aggAbTtest]]: per-group exact
    * (n, S1, S2) from one COUNT-level aggregate, then
    * `F = (SS_between/(k−1)) / (SS_within/(N−k))` where the
    * order-sensitive Σ S1_g²/n_g term rides the [[aggEntropy]]
    * determinism device — the per-group struct list is SORTED and
    * folded, so both engines run the identical float sequence (a
    * bare SUM over groups would be merge-order-dependent). Two
    * aggregates, the second over k rows; the log is scanned once.
    */
  def aggAnovaF(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables(spark, sfDir).events
      .select(col("event_type"), round(col("value") * 100).cast("long").as("xc"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("xc").cast("decimal(38,0)")).as("s1"),
        sum((col("xc") * col("xc")).cast("decimal(38,0)")).as("s2"))
    val g = per.agg(
      count(lit(1)).as("k"),
      sum("n").as("nn"),
      sum("s1").cast("decimal(38,0)").as("gs1"),
      sum("s2").cast("decimal(38,0)").as("gs2"),
      array_sort(collect_list(struct(col("event_type"), col("n"), col("s1"))))
        .as("gs"))
    val sumSq = aggregate(col("gs"), lit(0.0),
      (acc, p) => acc + p.getField("s1").cast("double") *
        p.getField("s1").cast("double") / p.getField("n").cast("double"))
    g.select(col("k"), col("nn").as("n_rows"), sumSq.as("ssq"),
        col("gs1"), col("gs2"))
      .select(col("k"), col("n_rows"),
        round(
          ((col("ssq") - col("gs1").cast("double") * col("gs1").cast("double") /
            col("n_rows").cast("double")) / (col("k") - 1).cast("double")) /
          ((col("gs2").cast("double") - col("ssq")) /
            (col("n_rows") - col("k")).cast("double")), 4).as("f_stat"))
  }

  val aggAnovaFSql: String =
    """WITH b AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xc FROM events),
      |per AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(xc AS DECIMAL(38,0))) AS s1,
      |    sum(CAST(xc * xc AS DECIMAL(38,0))) AS s2
      |  FROM b GROUP BY 1),
      |g AS (
      |  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n_rows,
      |    CAST(sum(s1) AS DECIMAL(38,0)) AS gs1,
      |    CAST(sum(s2) AS DECIMAL(38,0)) AS gs2,
      |    list_sort(list({'event_type': event_type, 'n': n, 's1': s1})) AS gs
      |  FROM per),
      |f AS (
      |  SELECT k, n_rows, gs1, gs2,
      |    list_aggregate(list_transform(gs,
      |      p -> CAST(p['s1'] AS DOUBLE) * CAST(p['s1'] AS DOUBLE)
      |           / CAST(p['n'] AS DOUBLE)), 'sum') AS ssq
      |  FROM g)
      |SELECT k, n_rows,
      |  round(((ssq - CAST(gs1 AS DOUBLE) * CAST(gs1 AS DOUBLE) / CAST(n_rows AS DOUBLE))
      |          / CAST(k - 1 AS DOUBLE))
      |        / ((CAST(gs2 AS DOUBLE) - ssq) / CAST(n_rows - k AS DOUBLE)), 4) AS f_stat
      |FROM f""".stripMargin

  /** χ² independence test of event_type × day-of-week — "does traffic
    * mix shift across the week": observed counts O from one COUNT
    * aggregate, expected E = row·col/n from the broadcast margins, and
    * per-cell contribution (O·n − r·c)²/(r·c·n) computed from EXACT
    * integers with one division (identical in both engines). The χ²
    * totals are sums of the ROUNDED per-cell contributions carried as
    * exact DECIMAL(18,6) — summation-order-proof where a double sum
    * over the cells could split the rounding grid. Margins (≤ types +
    * 7 + 1 rows) broadcast; the log shuffles once at COUNT level.
    */
  def aggChisqIndependence(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir).events
      .select(col("event_type"), dayofweek(col("ts")).cast("long").as("dow"))
    val cells = e.groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
    val rowM = cells.groupBy("event_type").agg(sum("o").as("r"))
    val colM = cells.groupBy("dow").agg(sum("o").as("c"))
    val n = cells.agg(sum("o").as("n"))
    val num = (col("o") * col("n") - col("r") * col("c")).cast("decimal(38,0)")
    val contrib = round(
      (num * num).cast("double") /
        (col("r") * col("c")).cast("decimal(38,0)").cast("double") /
        col("n").cast("double"), 6)
    cells.join(broadcast(rowM), "event_type").join(broadcast(colM), "dow")
      .crossJoin(broadcast(n))
      .select(col("event_type"), contrib.cast("decimal(18,6)").as("cc"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_cells"),
        // exact decimal cell-sum re-enters double via scaled BIGINT
        // (χ² ≤ n, so ×10⁶ stays far inside int64)
        ((sum(col("cc")).cast("decimal(28,6)") * lit(1000000L)).cast("long")
          .cast("double") / lit(1e6)).as("chisq_part"))
      .orderBy("event_type")
  }

  val aggChisqIndependenceSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow FROM events),
      |cells AS (SELECT event_type, dow, count(*) AS o FROM e GROUP BY 1, 2),
      |rm AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |cm AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
      |scored AS (
      |  SELECT event_type,
      |    CAST(round(
      |      CAST(CAST(o * n - r * c AS DECIMAL(38,0)) * CAST(o * n - r * c AS DECIMAL(38,0)) AS DOUBLE)
      |      / CAST(CAST(r * c AS DECIMAL(38,0)) AS DOUBLE)
      |      / CAST(n AS DOUBLE), 6) AS DECIMAL(18,6)) AS cc
      |  FROM cells JOIN rm USING (event_type) JOIN cm USING (dow) CROSS JOIN t)
      |SELECT event_type, count(*) AS n_cells,
      |  CAST(CAST(CAST(sum(cc) AS DECIMAL(28,6)) * 1000000 AS BIGINT) AS DOUBLE) / 1e6 AS chisq_part
      |FROM scored GROUP BY 1 ORDER BY event_type""".stripMargin

  val aggCorrwithSql: String = {
    val cell = (f: String) =>
      s"""SELECT event_type, '$f' AS feature,
         |  round(CAST(s_y_$f * n - sy * s_$f AS DOUBLE)
         |        / (sqrt(CAST(syy * n - sy * sy AS DOUBLE))
         |           * sqrt(CAST(s_${f}_$f * n - s_$f * s_$f AS DOUBLE))), 6) + 0.0 AS corr_with_value
         |FROM s""".stripMargin
    val moments = Seq("m97", "m31", "hr").map { f =>
      s"""sum(CAST($f AS DECIMAL(38,0))) AS s_$f,
         |    sum(CAST($f * $f AS DECIMAL(38,0))) AS s_${f}_$f,
         |    sum(CAST(y * $f AS DECIMAL(38,0))) AS s_y_$f""".stripMargin
    }.mkString(",\n    ")
    s"""WITH b AS (
       |  SELECT event_type,
       |    CAST(round(value * 100) AS BIGINT) AS y,
       |    (event_id % 97 + 97) % 97 AS m97,
       |    (event_id % 31 + 31) % 31 AS m31,
       |    CAST(hour(ts) AS BIGINT) AS hr
       |  FROM events),
       |s AS (
       |  SELECT event_type, count(*) AS n,
       |    sum(CAST(y AS DECIMAL(38,0))) AS sy,
       |    sum(CAST(y * y AS DECIMAL(38,0))) AS syy,
       |    $moments
       |  FROM b GROUP BY 1)
       |${cell("m97")}
       |UNION ALL
       |${cell("m31")}
       |UNION ALL
       |${cell("hr")}
       |ORDER BY event_type, feature""".stripMargin
  }

  /** 10%-trimmed mean per group (scipy `trim_mean(x, 0.1)` — the
    * robust center): per event_type drop the k = floor(n/10) smallest
    * and largest values by EXACT rank under the (cents, event_id)
    * total order, mean the kept multiset. Rank ties break on event_id
    * for determinism, but the dropped VALUE multiset is rank-invariant,
    * so both engines sum identical integers; one final division + round
    * enters float. Plan: one keyed exchange shared by the rank window,
    * the count window and the aggregate (same partitioning throughout).
    */
  def aggTrimmedMean(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
    val ranked = Tables(spark, sfDir).events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("xc"), col("event_id"))
      .withColumn("rn", row_number().over(
        w.orderBy(col("xc"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(w))
    ranked.filter(col("rn") > floor(col("n") / 10) &&
        col("rn") <= col("n") - floor(col("n") / 10))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"),
        round(sum("xc").cast("double") / count(lit(1)) / 100.0, 6)
          .as("trimmed_mean"))
      .orderBy("event_type")
  }

  val aggTrimmedMeanSql: String =
    """WITH r AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xc,
      |    row_number() OVER (PARTITION BY event_type ORDER BY CAST(round(value * 100) AS BIGINT), event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type, count(*) AS n_kept,
      |  round(CAST(sum(xc) AS DOUBLE) / count(*) / 100.0, 6) AS trimmed_mean
      |FROM r
      |WHERE rn > n // 10 AND rn <= n - n // 10
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Harmonic mean per group (scipy `hmean` over the positive values):
    * n / Σ(1/x). Float discipline: each reciprocal 1/x is ONE
    * correctly-rounded IEEE division (identical in both engines), then
    * quantized once to DECIMAL(38,12) — the EWM weighted-product
    * lattice device — so the group sum is exact and order-free; n/sum
    * re-enters float through one identical division. Zeros are
    * excluded by definition (harmonic mean is over positive support).
    * One partial+final aggregate, map-side combinable.
    */
  def aggHarmonicMean(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .filter(col("value") > 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pos"),
        round(count(lit(1)).cast("double") /
          sum((lit(1.0) / col("value")).cast("decimal(38,12)"))
            .cast("double"), 6).as("harmonic_mean"))
      .orderBy("event_type")

  val aggHarmonicMeanSql: String =
    """SELECT event_type, count(*) AS n_pos,
      |  round(CAST(count(*) AS DOUBLE)
      |        / CAST(sum(CAST(1.0 / value AS DECIMAL(38,12))) AS DOUBLE), 6)
      |    AS harmonic_mean
      |FROM events WHERE value > 0
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Spearman rank correlation per group (pandas
    * `corr(method='spearman')`) — Pearson over tie-AVERAGED ranks,
    * the robust/monotone complement of [[aggCorrCov]]'s Pearson on the
    * same (value, event_id mod 97) pair. Exactness device: the
    * doubled average rank is an INTEGER via the two-rank identity
    * `2·avg_rank = rank_asc − rank_desc + n + 1` (a tie block at
    * positions a..b gives a − (n−b+1) + n + 1 = a + b), so every rank
    * is exact and ALL FOUR rank windows share one group exchange
    * (partitionBy event_type; four local sorts) — no per-(group,value)
    * count partitioning, no second shuffle. Co-moments ride
    * DECIMAL(38,0) (ranks ≤ 2n ⇒ Σ products ≈ 4n³, past int64 at
    * ~10⁶ rows/group; DuckDB twins them as HUGEINT — the rolling-kurt
    * discipline), and ρ enters float through one identical
    * numerator/√·√ sequence. The 2× rank scale cancels.
    */
  def aggSpearman(spark: SparkSession, sfDir: String): DataFrame = {
    val wet = Window.partitionBy("event_type")
    def avg2(c: String) =
      rank().over(wet.orderBy(col(c))).cast("long") -
        rank().over(wet.orderBy(col(c).desc)) +
        count(lit(1)).over(wet) + lit(1L)
    val ranked = Tables(spark, sfDir).events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("xc"),
        pmod(col("event_id"), lit(97L)).as("yv"))
      .select(col("event_type"), avg2("xc").as("rx2"), avg2("yv").as("ry2"))
    def d(c: Column) = c.cast("decimal(38,0)")
    val s = ranked.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(d(col("rx2"))).as("sx"), sum(d(col("ry2"))).as("sy"),
      sum(d(col("rx2")) * col("rx2")).as("sxx"),
      sum(d(col("ry2")) * col("ry2")).as("syy"),
      sum(d(col("rx2")) * col("ry2")).as("sxy"))
    val dx = col("n") * col("sxx") - col("sx") * col("sx")
    val dy = col("n") * col("syy") - col("sy") * col("sy")
    s.select(col("event_type"), col("n"),
      when(col("n") >= 2 && dx > 0 && dy > 0,
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))), 6) + lit(0.0))
        .as("spearman_rho"))
      .orderBy("event_type")
  }

  val aggSpearmanSql: String =
    """WITH b AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xc,
      |    (event_id % 97 + 97) % 97 AS yv
      |  FROM events),
      |r AS (
      |  SELECT event_type,
      |    rank() OVER (PARTITION BY event_type ORDER BY xc)
      |      - rank() OVER (PARTITION BY event_type ORDER BY xc DESC)
      |      + count(*) OVER (PARTITION BY event_type) + 1 AS rx2,
      |    rank() OVER (PARTITION BY event_type ORDER BY yv)
      |      - rank() OVER (PARTITION BY event_type ORDER BY yv DESC)
      |      + count(*) OVER (PARTITION BY event_type) + 1 AS ry2
      |  FROM b),
      |s AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(rx2 AS HUGEINT)) AS sx, sum(CAST(ry2 AS HUGEINT)) AS sy,
      |    sum(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
      |    sum(CAST(ry2 AS HUGEINT) * ry2) AS syy,
      |    sum(CAST(rx2 AS HUGEINT) * ry2) AS sxy
      |  FROM r GROUP BY 1)
      |SELECT event_type, n,
      |  CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |       THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
      |                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) + 0.0
      |  END AS spearman_rho
      |FROM s ORDER BY event_type""".stripMargin
}
