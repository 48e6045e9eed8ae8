package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import util._

/** Sort / limit / top-k / set-op / dedup surface (SURVEY.md §2.6).
  *
  * `orderBy` is Spark's range-partitioned sample sort (the same
  * algorithm as Dask's sort_values); `orderBy().limit(k)` collapses to
  * TakeOrderedAndProject — per-partition top-k then a k-row merge on the
  * driver, never a full sort. Set ops are distinct-semantics shuffles on
  * the full row, exactly Dask's concat+drop_duplicates idiom.
  */
object SortSetOps {

  /** Multi-key sort with mixed asc/desc and a unique tiebreaker. */
  def sortMultiKey(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice"))
      .orderBy(col("o_orderstatus").asc, col("o_orderpriority").desc,
        col("o_totalprice").desc, col("o_orderkey").asc)

  val sortMultiKeySql: String =
    """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
      |FROM orders
      |ORDER BY o_orderstatus ASC, o_orderpriority DESC, o_totalprice DESC, o_orderkey ASC""".stripMargin

  /** head(n): deterministic limit after a total sort. */
  def sortLimit(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
      .limit(100)

  val sortLimitSql: String =
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100"

  /** nlargest(10): plans as TakeOrderedAndProject (per-partition heap,
    * no global sort).
    */
  def topkNlargest(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  val topkNlargestSql: String =
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"

  /** drop_duplicates over a projection. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  val dedupExactSql: String =
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY o_orderstatus, o_orderpriority"

  private def fOrders(spark: SparkSession, sfDir: String) =
    Tables(spark, sfDir).orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
  private def bigOrders(spark: SparkSession, sfDir: String) =
    Tables(spark, sfDir).orders.filter(col("o_totalprice") > 100000)
      .select(col("o_custkey"))

  /** concat(axis=0): bag union keeping duplicates, tagged by source. */
  def setopUnionAll(spark: SparkSession, sfDir: String): DataFrame =
    fOrders(spark, sfDir).withColumn("src", lit("f"))
      .unionByName(bigOrders(spark, sfDir).withColumn("src", lit("big")))
      .orderBy("o_custkey", "src")

  val setopUnionAllSql: String =
    """SELECT o_custkey, 'f' AS src FROM orders WHERE o_orderstatus = 'F'
      |UNION ALL
      |SELECT o_custkey, 'big' AS src FROM orders WHERE o_totalprice > 100000
      |ORDER BY o_custkey, src""".stripMargin

  /** concat + drop_duplicates: distinct union. */
  def setopUnionDistinct(spark: SparkSession, sfDir: String): DataFrame =
    fOrders(spark, sfDir).union(bigOrders(spark, sfDir))
      .distinct()
      .orderBy("o_custkey")

  val setopUnionDistinctSql: String =
    """SELECT DISTINCT o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  UNION ALL
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      |ORDER BY o_custkey""".stripMargin

  /** INTERSECT and EXCEPT (distinct semantics on both engines), stacked
    * into one result tagged by op.
    */
  def setopIntersectExcept(spark: SparkSession, sfDir: String): DataFrame = {
    val a = fOrders(spark, sfDir)
    val b = bigOrders(spark, sfDir)
    a.intersect(b).withColumn("op", lit("intersect"))
      .unionByName(a.except(b).withColumn("op", lit("except")))
      .orderBy("op", "o_custkey")
  }

  val setopIntersectExceptSql: String =
    """SELECT o_custkey, 'intersect' AS op FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      |UNION ALL
      |SELECT o_custkey, 'except' AS op FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      |ORDER BY op, o_custkey""".stripMargin

  /** INTERSECT ALL / EXCEPT ALL — multiset semantics (pandas keeps
    * duplicate rows; the distinct-flavored ops above silently collapse
    * them). Native Spark `intersectAll`/`exceptAll`: a single
    * count-per-row aggregate + generate on each side, no join blowup.
    */
  def setopAllVariants(spark: SparkSession, sfDir: String): DataFrame = {
    val a = fOrders(spark, sfDir)
    val b = bigOrders(spark, sfDir)
    a.intersectAll(b).withColumn("op", lit("intersect_all"))
      .unionByName(a.exceptAll(b).withColumn("op", lit("except_all")))
      .orderBy("op", "o_custkey")
  }

  val setopAllVariantsSql: String =
    """SELECT o_custkey, 'intersect_all' AS op FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      |UNION ALL
      |SELECT o_custkey, 'except_all' AS op FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      |ORDER BY op, o_custkey""".stripMargin

  /** Symmetric difference (pandas `Index.symmetric_difference` /
    * `s1 ^ s2`): rows in exactly one of the two sets, tagged by which
    * side they came from. Two anti-directional EXCEPTs stacked — each a
    * keyed hash aggregate, no join blowup; the side tag makes the
    * result a reconciliation report ("only in A" / "only in B"), the
    * shape a data-diff tool emits.
    */
  def setopSymmetricDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val a = fOrders(spark, sfDir)
    val b = bigOrders(spark, sfDir)
    a.except(b).withColumn("side", lit("only_a"))
      .unionByName(b.except(a).withColumn("side", lit("only_b")))
      .orderBy("side", "o_custkey")
  }

  val setopSymmetricDiffSql: String =
    """SELECT o_custkey, 'only_a' AS side FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      |UNION ALL
      |SELECT o_custkey, 'only_b' AS side FROM (
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY side, o_custkey""".stripMargin

  /** nsmallest(10) with an explicit unique tiebreaker (pandas
    * `nsmallest` keeps first occurrence on ties; a distributed engine
    * has no row order, so the key itself is the deterministic
    * tie-break). Same TakeOrdered per-partition-heap plan as nlargest.
    */
  def topkNsmallest(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).orders
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      .limit(10)

  val topkNsmallestSql: String =
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 10"

  /** pandas `groupby().head(n)`: the first n rows of every group under
    * an explicit deterministic order (a distributed engine has no "original
    * order"; the key is the tie-free sort). Plans as one window over one
    * exchange with the rank filter pushed into the sort
    * (WindowGroupLimit), like the top-n family.
    */
  def groupbyHead(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    Tables(spark, sfDir).customer
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 3)
      .select("c_mktsegment", "c_custkey", "c_name")
      .orderBy("c_mktsegment", "c_custkey")
  }

  val groupbyHeadSql: String =
    """SELECT c_mktsegment, c_custkey, c_name FROM (
      |  SELECT c_mktsegment, c_custkey, c_name,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn
      |  FROM customer)
      |WHERE rn <= 3
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** pandas `groupby().tail(n)`: last n per group = head(n) under the
    * reversed tie-free order; same WindowGroupLimit plan (3 rows per
    * group in the exchange, not the group).
    */
  def groupbyTail(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_custkey").desc)
    Tables(spark, sfDir).customer
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 3)
      .select("c_mktsegment", "c_custkey", "c_name")
      .orderBy("c_mktsegment", "c_custkey")
  }

  val groupbyTailSql: String =
    """SELECT c_mktsegment, c_custkey, c_name FROM (
      |  SELECT c_mktsegment, c_custkey, c_name,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey DESC) AS rn
      |  FROM customer)
      |WHERE rn <= 3
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** pandas `groupby().nth(n)` — the k-th member of each group under a
    * TOTAL order (here: each customer's 3rd order by date, orderkey
    * tiebreak). Same WindowGroupLimit shape as groupby().head — Spark
    * prunes per-group scanning at rank k during the sort — but emitting
    * exactly the one rank-k row per group (groups with fewer than k
    * members emit nothing, the pandas contract).
    */
  def groupbyNth(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    Tables(spark, sfDir).orders
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 3)
      .select(col("o_custkey"), col("o_orderkey"),
        fmtDay(col("o_orderdate")).as("order_day"), col("o_totalprice"))
      .orderBy("o_custkey")
  }

  val groupbyNthSql: String =
    """SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_day, o_totalprice
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn = 3
      |ORDER BY o_custkey""".stripMargin

  /** Nested denormalization / training-example assembly: each order's
    * lines collapse to ONE ordered string payload (the SFT-export
    * shape: parent + deterministically-ordered child concatenation).
    * The order lives INSIDE the aggregate — array_sort over packed
    * (linenumber, payload) structs after a plain collect_list — so the
    * plan is one keyed exchange + one aggregate, never a window sort of
    * the whole child table, and the struct sort is per-GROUP (bounded:
    * ≤7 lines/order), not a shuffle-wide ordering. Emitted as a string
    * because nested array-of-struct repr is not comparable across
    * engines; a real export would keep the struct array.
    */
  def denormOrderLines(spark: SparkSession, sfDir: String): DataFrame = {
    // (ln, qty, partkey) is a TOTAL order inside an order in this
    // fixture (linenumber alone is NOT unique here) — a non-total sort
    // would make the concatenation nondeterministic across engines
    val li = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey"),
        struct(col("l_linenumber").as("ln"),
          col("l_quantity").cast("long").as("q"),
          col("l_partkey").as("pk"),
          concat_ws(":", col("l_linenumber"),
            col("l_quantity").cast("long")).as("s")).as("p"))
    li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        array_join(expr("transform(array_sort(collect_list(p)), x -> x.s)"),
          ",").as("lines"))
      .orderBy("l_orderkey")
  }

  val denormOrderLinesSql: String =
    """SELECT l_orderkey, count(*) AS n_lines,
      |  string_agg(l_linenumber || ':' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), ','
      |             ORDER BY l_linenumber, CAST(l_quantity AS BIGINT), l_partkey) AS lines
      |FROM lineitem GROUP BY 1 ORDER BY l_orderkey""".stripMargin
}
