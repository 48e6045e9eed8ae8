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
}
