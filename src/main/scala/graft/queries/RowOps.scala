package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import util._

/** Projection / filter / per-row transformation surface (SURVEY.md §2.2).
  *
  * All narrow (no-shuffle) operators: select/rename/cast/when/explode
  * stay inside one whole-stage-codegen span, and the filters and
  * projections are pushed into the parquet scan by Catalyst. At 100 TB
  * these cost one streaming pass over only the referenced columns.
  */
object RowOps {

  /** Column select + rename + drop. */
  def projectRename(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).customer
      .select(col("c_custkey").as("cust_id"), col("c_name").as("name"),
        col("c_acctbal").as("balance"), col("c_mktsegment"))
      .drop("c_mktsegment")
      .orderBy("cust_id")

  val projectRenameSql: String =
    "SELECT c_custkey AS cust_id, c_name AS name, c_acctbal AS balance FROM customer ORDER BY cust_id"

  /** Boolean-mask filtering with a conjunction of predicate shapes. */
  def filterPred(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .filter(col("l_quantity").between(10, 20) &&
        col("l_returnflag") === "R" &&
        col("l_discount") < 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // fixture — order by every output column for a total order
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")

  val filterPredSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
      |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R' AND l_discount < 0.05
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin

  /** astype equivalents. floor() before integral casts: Spark truncates
    * double->int while DuckDB rounds, so the explicit floor pins the
    * semantics on both sides (SURVEY.md §4.2).
    */
  def castTypes(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).customer
      .select(
        col("c_custkey").cast("int").as("cust_int"),
        col("c_custkey").cast("string").as("cust_str"),
        floor(col("c_acctbal")).cast("long").as("bal_floor"),
        round(col("c_acctbal"), 2).cast("decimal(12,2)").cast("double").as("bal_dec"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("name_num"))
      .orderBy("cust_int")

  val castTypesSql: String =
    """SELECT CAST(c_custkey AS INTEGER) AS cust_int,
      | CAST(c_custkey AS VARCHAR) AS cust_str,
      | CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
      | CAST(CAST(round(c_acctbal, 2) AS DECIMAL(12,2)) AS DOUBLE) AS bal_dec,
      | CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num
      |FROM customer ORDER BY cust_int""".stripMargin

  /** fillna / dropna semantics. Fixtures carry no NULLs, so nulls are
    * synthesized (negative balances -> NULL), then counted, coalesced,
    * and aggregated per segment — count(col) vs count(*) is the dropna
    * evidence.
    */
  def nullHandling(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables(spark, sfDir).customer
      .withColumn("bal_n", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
    c.groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("bal_n")).as("n_nonnull"),
        dsum(coalesce(col("bal_n"), lit(0.0)), 2).as("sum_filled"))
      .orderBy("c_mktsegment")
  }

  val nullHandlingSql: String =
    s"""SELECT c_mktsegment, count(*) AS n_rows, count(bal_n) AS n_nonnull,
       | ${dsumSql("coalesce(bal_n, 0.0)", 2)} AS sum_filled
       |FROM (SELECT c_mktsegment, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_n FROM customer)
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** CASE WHEN tiers + IN-list predicate + BETWEEN. */
  def caseWhenIsin(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).lineitem
      .filter(col("l_returnflag").isin("A", "R") &&
        col("l_extendedprice").between(1000, 50000))
      .withColumn("qty_tier",
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high"))
      .groupBy("l_returnflag", "qty_tier")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice"), 2).as("sum_price"))
      .orderBy("l_returnflag", "qty_tier")

  val caseWhenIsinSql: String =
    s"""SELECT l_returnflag,
       | CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_tier,
       | count(*) AS n, ${dsumSql("l_extendedprice", 2)} AS sum_price
       |FROM lineitem
       |WHERE l_returnflag IN ('A','R') AND l_extendedprice BETWEEN 1000 AND 50000
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Unnest a list column (Catalyst Generator / generate exec). Rows with
    * equal (vec_id, val) are interchangeable, so ordering by both is
    * total for comparison purposes.
    */
  def explodeArray(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).embeddings
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), explode(col("embedding")).as("x"))
      .select(col("vec_id"), round(col("x").cast("double"), 6).as("val"))
      .orderBy("vec_id", "val")

  val explodeArraySql: String =
    """SELECT vec_id, round(CAST(unnest(embedding) AS DOUBLE), 6) AS val
      |FROM embeddings WHERE vec_id < 10
      |ORDER BY vec_id, val""".stripMargin

  /** pandas/Dask `get_dummies`: one indicator column per category of a
    * low-cardinality column, with an EXPLICIT category list (inferring
    * the domain at 100 TB is an extra full pass; production one-hot
    * pins the vocabulary). Plain when/otherwise projection — stays in
    * one codegen stage, no shuffle before the final order.
    */
  def onehotPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cats = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val dummies = cats.map(c =>
      when(col("o_orderpriority") === c, 1L).otherwise(0L)
        .as("pri_" + c.takeWhile(_ != '-')))
    Tables(spark, sfDir).orders
      .select(col("o_orderkey") +: dummies: _*)
      .orderBy("o_orderkey")
  }

  val onehotPrioritySql: String = {
    val cats = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val cols = cats.map(c =>
      s"CAST(CASE WHEN o_orderpriority = '$c' THEN 1 ELSE 0 END AS BIGINT) AS pri_${c.takeWhile(_ != '-')}")
    s"""SELECT o_orderkey, ${cols.mkString(", ")}
       |FROM orders ORDER BY o_orderkey""".stripMargin
  }

  /** Wide -> long via the stack() table-generating expression. */
  def meltUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).customer
      .filter(col("c_custkey") <= 100)
      .selectExpr("c_custkey",
        "stack(2, 'c_acctbal', c_acctbal, 'c_nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)")
      .orderBy("c_custkey", "metric")

  val meltUnpivotSql: String =
    """SELECT c_custkey, metric, val FROM (
      |  SELECT c_custkey, c_acctbal, CAST(c_nationkey AS DOUBLE) AS c_nationkey
      |  FROM customer WHERE c_custkey <= 100
      |) UNPIVOT (val FOR metric IN (c_acctbal, c_nationkey))
      |ORDER BY c_custkey, metric""".stripMargin
}
