package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Write-once bucketed layout for the two FACT tables on their join
  * key (SURVEY.md §2.6 "bucketed co-located joins", promoted from a
  * spec-only proof to a declared-query surface): orders and lineitem
  * both bucketed (and sorted) by orderkey into the same bucket count,
  * so every subsequent orders⋈lineitem join in the session plans with
  * ZERO Exchange on either side — the recurring star-join shuffle
  * becomes a one-time layout decision, the same economics as
  * [[CoPurchaseGraph]]'s edge tables and the ANN `__cell` index.
  *
  * Memoized per (catalog, fixture): the first caller pays the two
  * bucketed writes, everyone after reads the catalog tables — guarded
  * by a [[FixtureSignature]] freshness check, so regenerating the
  * fixture parquet rebuilds instead of silently reusing stale buckets. At 100 TB
  * the bucket count comes from Bucketing's ~256 MB/bucket guidance;
  * here it matches the session's shuffle parallelism so the layout is
  * neutral for the non-bucketed remainder of each plan.
  */
final case class BucketedFacts(spark: SparkSession,
    ordersTable: String, lineitemTable: String) {
  def orders: DataFrame = spark.table(ordersTable)
  def lineitem: DataFrame = spark.table(lineitemTable)
}

object BucketedFacts {
  def apply(spark: SparkSession, sfDir: String): BucketedFacts =
    synchronized {
      val tag = sfDir.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[^a-z0-9]", "_")
      val oT = s"graft_bucketed_orders_$tag"
      val lT = s"graft_bucketed_lineitem_$tag"
      // freshness, not just existence: a regenerated fixture at the same
      // path must invalidate the persistent-warehouse layout (see
      // FixtureSignature — stat-cheap, validated on every reuse)
      val sig = FixtureSignature.of(
        Seq(s"$sfDir/orders.parquet", s"$sfDir/lineitem.parquet"))
      if (!FixtureSignature.fresh(spark, oT, sig) ||
          !FixtureSignature.fresh(spark, lT, sig)) {
        val buckets = scala.util.Try(
          spark.conf.get("spark.sql.shuffle.partitions").toInt)
          .getOrElse(32).max(1)
        val t = Tables(spark, sfDir)
        Bucketing.writeBucketed(
          t.orders.select(col("o_orderkey"), col("o_custkey"),
            col("o_orderpriority"), col("o_orderdate"), col("o_totalprice")),
          oT, "o_orderkey", buckets)
        Bucketing.writeBucketed(
          t.lineitem.select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount"), col("l_quantity"), col("l_returnflag")),
          lT, "l_orderkey", buckets)
        FixtureSignature.record(spark, oT, sig)
        FixtureSignature.record(spark, lT, sig)
      }
      BucketedFacts(spark, oT, lT)
    }
}
