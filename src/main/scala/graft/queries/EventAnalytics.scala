package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables
import util._

/** Event-sequence analytics over the `events` stream table (SURVEY.md
  * §2.9 extension, round 11): funnel conversion, cohort retention, and
  * capped co-visitation — the classic product-analytics trio every
  * event warehouse runs weekly, each expressed as equi-shuffle plans
  * that survive a 100 TB event log.
  *
  * Shared scale doctrine: every query here reduces per USER first
  * (groupBy user_id — the natural partition key of an event log, so
  * consecutive stages reuse one co-partitioned shuffle), and anything
  * per-user that could be unbounded (a power user's item set) is capped
  * DETERMINISTICALLY before pair expansion, turning worst-case
  * quadratic work into a documented constant per user.
  */
object EventAnalytics {

  /** Ordered 3-step funnel (view → click → purchase): a user converts
    * step k only with an event STRICTLY AFTER their step-(k−1) time —
    * the sequential constraint that distinguishes a funnel from three
    * independent counts. Min-time chaining: each stage is a filtered
    * per-user min-timestamp aggregate joined to the previous stage,
    * so the funnel is three co-partitioned shuffles on user_id, each
    * over a strictly shrinking user set — no window over a user's whole
    * event history, no per-user event sort.
    */
  def funnelConversion(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").where(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").where(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def row(step: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_users"), sum("user_id").as("ids_sum"))
        .select(lit(step).as("step"), col("n_users"), col("ids_sum"))
    row("1_view", s1).unionByName(row("2_click", s2))
      .unionByName(row("3_purchase", s3))
      .orderBy("step")
  }

  val funnelConversionSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |  JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |  JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      |SELECT '1_view' AS step, count(*) AS n_users,
      |  CAST(sum(user_id) AS BIGINT) AS ids_sum FROM s1
      |UNION ALL SELECT '2_click', count(*), CAST(sum(user_id) AS BIGINT) FROM s2
      |UNION ALL SELECT '3_purchase', count(*), CAST(sum(user_id) AS BIGINT) FROM s3
      |ORDER BY step""".stripMargin

  /** Weekly cohort retention: users bucketed by the week of their FIRST
    * event (one per-user min aggregate), then each (cohort week, weeks
    * since) cell counts the distinct users active that week. The
    * first-event frame joins back on user_id — the same co-partitioned
    * key as the aggregate that produced it — and both week columns
    * truncate to Monday identically in both engines (the `'W-MON'`
    * parity `ts_tumbling_week` pins). The offset divides a
    * Monday-aligned day difference by 7 — exact in doubles.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
    val first = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
    ev.select("user_id", "ts").join(first, "user_id")
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).as("cw"),
        date_trunc("week", col("ts")).as("aw"))
      .groupBy(fmtDay(col("cw")).as("cohort_week"),
        (datediff(col("aw"), col("cw")) / 7).cast("int").as("week_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  val cohortRetentionSql: String =
    """WITH first AS (
      |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1)
      |SELECT strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
      |  CAST(date_diff('day', date_trunc('week', f.first_ts),
      |                 date_trunc('week', e.ts)) / 7 AS INT) AS week_offset,
      |  count(DISTINCT e.user_id) AS n_active
      |FROM events e JOIN first f USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** Co-visitation item pairs ("users who viewed X also viewed Y"): the
    * canonical collaborative-filtering prep and the canonical self-join
    * skew trap. Raw per-user pair expansion is quadratic in a power
    * user's item count, so each user's distinct viewed-item set is
    * first capped to its `maxItemsPerUser` smallest item ids — a
    * DETERMINISTIC cap (a pure function of the user's item set, so
    * re-runs and both engines agree; a production selector would swap
    * in recency or frequency rank, same plan shape) applied through a
    * WindowGroupLimit-able rank, bounding every user at
    * C(cap, 2) pairs. After the cap: one equi self-join on user_id
    * (both sides the SAME capped frame — one shuffle, reused), pair
    * canonicalization by id order, and a pair-count aggregate filtered
    * to `minSupport`.
    */
  def covisitItemPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val maxItemsPerUser = 16
    val minSupport = 3
    val items = Tables(spark, sfDir).events
      .filter(col("event_type") === "view")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull)
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("item")))
      .filter(col("rn") <= maxItemsPerUser)
      .select("user_id", "item")
    items.select(col("user_id"), col("item").as("item_a"))
      .join(items.select(col("user_id"), col("item").as("item_b")), "user_id")
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= minSupport)
      .orderBy(col("n_users").desc, col("item_a"), col("item_b"))
  }

  val covisitItemPairsSql: String =
    """WITH items AS (
      |  SELECT user_id, item FROM (
      |    SELECT user_id, item,
      |      row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
      |    FROM (
      |      SELECT DISTINCT user_id,
      |        TRY_CAST(json_extract_string(props, '$.k') AS INT) AS item
      |      FROM events WHERE event_type = 'view'
      |        AND TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL))
      |  WHERE rn <= 16)
      |SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_users
      |FROM items a JOIN items b ON a.user_id = b.user_id AND a.item < b.item
      |GROUP BY 1, 2 HAVING count(*) >= 3
      |ORDER BY n_users DESC, item_a, item_b""".stripMargin

  /** Last-touch revenue attribution: every purchase is credited to the
    * item of the user's most recent click AT OR BEFORE the purchase
    * (ties broken by event_id — a total, engine-independent order);
    * purchases with no prior click fall to the organic bucket (−1).
    * The classic marketing-attribution shape, and the reason it is NOT
    * an as-of join here: clicks and purchases live in the SAME event
    * log, so one pass — a running `last(item, ignoreNulls)` over the
    * user's (ts, event_id)-ordered stream, where only click rows carry
    * an item — beats joining the log to itself. ONE window shuffle on
    * user_id + one small aggregate; at 100 TB the event log crosses the
    * wire exactly once (an as-of join formulation shuffles both sides).
    */
  def eventAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"),
        when(col("event_type") === "click",
          get_json_object(col("props"), "$.k").cast("int")).as("item"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("attr_item", last("item", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("attr_item"), lit(-1)).as("item"))
      .agg(count(lit(1)).as("n_purchases"), dsum(col("value"), 2).as("revenue"))
      .orderBy("item")
  }

  val eventAttributionSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_id, event_type, value,
       |    CASE WHEN event_type = 'click'
       |      THEN TRY_CAST(json_extract_string(props, '$$.k') AS INT) END AS item
       |  FROM events WHERE event_type IN ('click', 'purchase')),
       |attr AS (
       |  SELECT *, last_value(item IGNORE NULLS) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr_item
       |  FROM ev)
       |SELECT coalesce(attr_item, -1) AS item, count(*) AS n_purchases,
       | ${dsumSql("value", 2)} AS revenue
       |FROM attr WHERE event_type = 'purchase'
       |GROUP BY 1 ORDER BY item""".stripMargin

  /** RFM customer segmentation — the classic marketing-analytics
    * scoring: per customer Recency (latest order day), Frequency
    * (order count), Monetary (lifetime cents), each scored into
    * within-segment quintiles, then the 125-cell segment grid profiled.
    *
    * Quintiles ride the [[TrainPrep.transformWinsorize]] rank-fence
    * discipline, NOT ntile: the four cutoffs per (segment, metric) are
    * exact order statistics (rows where rn = ceil(n·k/5)) found under a
    * total (metric, custkey) order and BROADCAST back, and a customer's
    * score is `1 + Σ (metric > cutoff_k)` — so ties share a score
    * (value-quintiles, the semantics a marketer actually wants) and the
    * per-customer frame is touched by windows only WITHIN segment
    * partitions. At 100 TB the per-customer reduce is the only
    * full-data shuffle AND it runs exactly once: the three metrics'
    * ranks ride one shared segment exchange, and the fence aggregate
    * and scoring join both reuse it (plan-pinned — one orders scan).
    * Everything after runs on |customers| rows and the cutoff frame is
    * 5 segs × 12 values.
    */
  def segRfm(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    val percust = t.orders
      .join(t.customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(max(datediff(col("o_orderdate"), lit("1992-01-01"))).as("rec_d"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("mon_c"))
    // ONE ranked pass for all three metrics (r15 ADVICE): the three
    // row_numbers and the segment count share a single exchange on
    // c_mktsegment (four Window ops, one keyed shuffle), and BOTH
    // consumers — the 12-fence aggregate and the scoring join — reuse
    // that exchange, so the orders⋈customer reduce (the only full-data
    // shuffle) runs once, matching the oracle's MATERIALIZED percust.
    // (The previous form re-derived percust in each of three fences()
    // passes and again for scoring — four full scans of orders.)
    val metrics = Seq("rec_d", "freq", "mon_c")
    def w(metric: String) =
      Window.partitionBy("c_mktsegment").orderBy(col(metric), col("o_custkey"))
    val ranked = metrics.foldLeft(
        percust.withColumn("n",
          count(lit(1)).over(Window.partitionBy("c_mktsegment")))) {
      (df, m) => df.withColumn(s"__rn_$m", row_number().over(w(m)))
    }
    def fence(k: Int) = ceil(col("n") * lit(k.toDouble) / lit(5.0)).cast("long")
    val hitsAny = metrics.flatMap(m =>
      (1 to 4).map(k => col(s"__rn_$m") === fence(k))).reduce(_ || _)
    val fenceAggs = metrics.flatMap(m => (1 to 4).map(k =>
      min(when(col(s"__rn_$m") === fence(k), col(m))).as(s"${m}_q$k")))
    val cuts = ranked.filter(hitsAny)
      .groupBy("c_mktsegment").agg(fenceAggs.head, fenceAggs.tail: _*)
    def score(metric: String) =
      (1 to 4).map(k => when(col(metric) > col(s"${metric}_q$k"), 1).otherwise(0))
        .reduce(_ + _) + lit(1)
    ranked.join(broadcast(cuts), "c_mktsegment")
      .select(col("c_mktsegment"), score("rec_d").as("r_q"),
        score("freq").as("f_q"), score("mon_c").as("m_q"), col("mon_c"))
      .groupBy("c_mktsegment", "r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("mon_c")).cast("double") / lit(100.0)).as("monetary_sum"))
      .orderBy("c_mktsegment", "r_q", "f_q", "m_q")
  }

  val segRfmSql: String = {
    def fencesSql(metric: String) =
      s"""SELECT c_mktsegment,
         |    ${(1 to 4).map(k =>
        s"min(CASE WHEN rn = CAST(ceil(n * $k.0 / 5.0) AS BIGINT) THEN $metric END) AS ${metric}_q$k")
        .mkString(",\n    ")}
         |  FROM (SELECT c_mktsegment, $metric, o_custkey,
         |          row_number() OVER (PARTITION BY c_mktsegment ORDER BY $metric, o_custkey) AS rn,
         |          count(*) OVER (PARTITION BY c_mktsegment) AS n
         |        FROM percust)
         |  WHERE ${(1 to 4).map(k => s"rn = CAST(ceil(n * $k.0 / 5.0) AS BIGINT)").mkString(" OR ")}
         |  GROUP BY 1""".stripMargin
    def scoreSql(metric: String) =
      "1 + " + (1 to 4).map(k =>
        s"(CASE WHEN $metric > ${metric}_q$k THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH percust AS MATERIALIZED (
       |  SELECT c_mktsegment, o_custkey,
       |    max(datediff('day', DATE '1992-01-01', o_orderdate)) AS rec_d,
       |    count(*) AS freq,
       |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS mon_c
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1, 2),
       |fr AS (${fencesSql("rec_d")}),
       |ff AS (${fencesSql("freq")}),
       |fm AS (${fencesSql("mon_c")}),
       |scored AS (
       |  SELECT p.c_mktsegment,
       |    CAST(${scoreSql("rec_d")} AS INT) AS r_q,
       |    CAST(${scoreSql("freq")} AS INT) AS f_q,
       |    CAST(${scoreSql("mon_c")} AS INT) AS m_q,
       |    mon_c
       |  FROM percust p
       |    JOIN fr USING (c_mktsegment)
       |    JOIN ff USING (c_mktsegment)
       |    JOIN fm USING (c_mktsegment))
       |SELECT c_mktsegment, r_q, f_q, m_q, count(*) AS n_customers,
       |  CAST(sum(mon_c) AS DOUBLE) / 100.0 AS monetary_sum
       |FROM scored GROUP BY 1, 2, 3, 4
       |ORDER BY c_mktsegment, r_q, f_q, m_q""".stripMargin
  }

  /** Association rules over the co-visitation pair set — the
    * support / confidence / lift triple of market-basket analysis,
    * on EXACT integer counts: n_ab from the capped pair expansion of
    * [[covisitItemPairs]], item supports n_a/n_b from the same capped
    * item set, the user universe from one COUNT aggregate. Lift > 1
    * reads "seen together more than independence predicts". The pair
    * frame is bounded (cap²/2 per user) and the two support joins key
    * on a bounded item vocabulary — both BROADCAST; ratios enter
    * floating point through one identical division each. Top-30 by
    * (lift, pair) via TakeOrdered — never a global sort.
    */
  def assocRulesLift(spark: SparkSession, sfDir: String): DataFrame =
    assocRules(spark, sfDir, minSupport = 3)

  /** [[assocRulesLift]] with the support floor exposed — the spec drives
    * a lower floor so the sf0.001 fixture (max pair support 2) still
    * exercises the ratio arithmetic non-vacuously.
    */
  private[graft] def assocRules(spark: SparkSession, sfDir: String,
      minSupport: Int): DataFrame = {
    val maxItemsPerUser = 16
    val items = Tables(spark, sfDir).events
      .filter(col("event_type") === "view")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull)
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("item")))
      .filter(col("rn") <= maxItemsPerUser)
      .select("user_id", "item")
    val nUsers = items.agg(countDistinct(col("user_id")).as("n_users"))
    val supports = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = items.select(col("user_id"), col("item").as("item_a"))
      .join(items.select(col("user_id"), col("item").as("item_b")), "user_id")
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(broadcast(supports.select(col("item").as("item_a"), col("n_item").as("n_a"))), "item_a")
      .join(broadcast(supports.select(col("item").as("item_b"), col("n_item").as("n_b"))), "item_b")
      .crossJoin(broadcast(nUsers))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
          .as("conf_a_to_b"),
        round(col("n_ab").cast("double") / col("n_b").cast("double"), 6)
          .as("conf_b_to_a"),
        round((col("n_ab") * col("n_users")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(30)
  }

  val assocRulesLiftSql: String =
    """WITH items AS MATERIALIZED (
      |  SELECT user_id, item FROM (
      |    SELECT user_id, item,
      |      row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
      |    FROM (SELECT DISTINCT user_id,
      |            TRY_CAST(json_extract_string(props, '$.k') AS INT) AS item
      |          FROM events WHERE event_type = 'view')
      |    WHERE item IS NOT NULL)
      |  WHERE rn <= 16),
      |u AS (SELECT count(DISTINCT user_id) AS n_users FROM items),
      |sup AS (SELECT item, count(*) AS n_item FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
      |  FROM items a JOIN items b
      |    ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2 HAVING count(*) >= 3)
      |SELECT item_a, item_b, n_ab, sa.n_item AS n_a, sb.n_item AS n_b,
      |  round(CAST(n_ab AS DOUBLE) / CAST(sa.n_item AS DOUBLE), 6) AS conf_a_to_b,
      |  round(CAST(n_ab AS DOUBLE) / CAST(sb.n_item AS DOUBLE), 6) AS conf_b_to_a,
      |  round(CAST(n_ab * u.n_users AS DOUBLE) / CAST(sa.n_item * sb.n_item AS DOUBLE), 6) AS lift
      |FROM pairs
      |  JOIN sup sa ON item_a = sa.item
      |  JOIN sup sb ON item_b = sb.item
      |  CROSS JOIN u
      |ORDER BY lift DESC, item_a, item_b LIMIT 30""".stripMargin
}
