package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The Dask UDF-surface equivalents (SURVEY.md §2.10): `map_partitions`,
  * `apply(axis=1)`, and `groupby().apply`, expressed Spark-natively.
  *
  * Preference order at scale (SURVEY.md §2.10): built-in Catalyst
  * expressions (codegen, pushdown survive) > typed `mapPartitions`
  * (per-partition amortized setup, breaks codegen) > row UDF (per-row
  * dispatch AND an optimizer barrier). These exist for the semantics the
  * built-ins can't express; everything declared in SparkEntry uses
  * built-ins only.
  */
object RowUdfs {

  case class LineItemSlim(l_orderkey: Long, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double)

  case class PartitionStats(partitionId: Int, nRows: Long, sumNet: Double)

  /** map_partitions analogue: arbitrary per-partition logic with
    * amortized setup (here: per-partition accumulation producing one
    * summary row per partition — the shape of a partition-wise model
    * scorer or external-service batch call).
    */
  def mapPartitionsStats(spark: SparkSession, li: DataFrame): Dataset[PartitionStats] = {
    import spark.implicits._
    li.select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
      .as[LineItemSlim]
      .mapPartitions { it =>
        // expensive setup would go here, once per partition
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var n = 0L
        var sum = 0.0
        it.foreach { r => n += 1; sum += r.l_extendedprice * (1.0 - r.l_discount) }
        if (n == 0) Iterator.empty else Iterator(PartitionStats(pid, n, sum))
      }
  }

  /** apply(axis=1) analogue: a registered Scala UDF. Documented cost:
    * the optimizer can't see through it (no pushdown past it, no
    * codegen), so it stays OUT of declared queries.
    */
  val titleCase: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else s.split(' ').map(w =>
        if (w.isEmpty) w else w.head.toUpper + w.tail.toLowerCase).mkString(" ")
    }

  case class CustSpend(c_custkey: Long, o_totalprice: Double)
  case class CustProfile(c_custkey: Long, n: Long, maxRun: Long)

  /** groupby().apply analogue: flatMapGroups over a typed
    * KeyValueGroupedDataset — per-group sequential logic (here: longest
    * run of strictly increasing order totals, something no built-in agg
    * expresses). One shuffle on the group key, like any aggregation.
    */
  def groupApplyRuns(spark: SparkSession, orders: DataFrame): Dataset[CustProfile] = {
    import spark.implicits._
    orders.select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
      .as[CustSpend]
      .groupByKey(_.c_custkey)
      .flatMapGroups { (key, rows) =>
        val prices = rows.map(_.o_totalprice).toArray
        var maxRun = if (prices.isEmpty) 0L else 1L
        var run = 1L
        for (i <- 1 until prices.length) {
          if (prices(i) > prices(i - 1)) { run += 1; maxRun = math.max(maxRun, run) }
          else run = 1L
        }
        Iterator(CustProfile(key, prices.length.toLong, maxRun))
      }
  }
}
