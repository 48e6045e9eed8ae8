package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.Tables

/** SQL-frontend parity (SURVEY.md §3): the same engine drives
  * `spark.sql(...)` over registered views — a user who prefers SQL to
  * the DataFrame DSL gets the identical Catalyst plan. The query text is
  * deliberately ANSI enough that the DuckDB oracle runs a nearly
  * character-identical statement.
  */
object SqlFrontend {

  private val q3Body =
    """SELECT o_orderkey,
      | round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,8))) AS DOUBLE), 2) AS revenue,
      | count(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H-Q3-shaped "unshipped revenue" ranking via spark.sql. */
  def sqlQ3Shipping(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.customer.createOrReplaceTempView("customer")
    t.orders.createOrReplaceTempView("orders")
    t.lineitem.createOrReplaceTempView("lineitem")
    spark.sql(q3Body)
  }

  val sqlQ3ShippingSql: String = q3Body

  private val q5Body =
    """SELECT n_name,
      | round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,8))) AS DOUBLE), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H-Q5-shaped local-supplier volume: the 6-table join. Catalyst
    * gets the full optimizer workout here — region/nation prune to a
    * handful of rows and broadcast, the orders date filter pushes to the
    * scan, and AQE reorders the remaining shuffle joins; the DuckDB
    * oracle runs the character-identical statement.
    */
  def sqlQ5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    t.customer.createOrReplaceTempView("customer")
    t.orders.createOrReplaceTempView("orders")
    t.lineitem.createOrReplaceTempView("lineitem")
    t.supplier.createOrReplaceTempView("supplier")
    t.nation.createOrReplaceTempView("nation")
    t.region.createOrReplaceTempView("region")
    spark.sql(q5Body)
  }

  val sqlQ5LocalSupplierSql: String = q5Body
}
