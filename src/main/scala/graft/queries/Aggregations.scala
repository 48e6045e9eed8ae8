package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

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
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val aggBasicSql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      | round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(avg(l_extendedprice), 4) AS avg_price,
      | round(avg(l_discount), 6) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
