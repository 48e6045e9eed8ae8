package graft

import org.apache.spark.sql.functions._
import graft.operators.RowUdfs

class RowUdfsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("mapPartitions stats reconstruct the global aggregate") {
    val parts = RowUdfs.mapPartitionsStats(spark, li).collect()
    val n = parts.map(_.nRows).sum
    val total = parts.map(_.sumNet).sum
    val expected = li.select(
        count(lit(1)).cast("long"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .as[(Long, Double)].head()
    assert(n == expected._1)
    assert(math.abs(total - expected._2) / expected._2 < 1e-9)
  }

  test("mapPartitions stats are partitioning-invariant in total") {
    val a = RowUdfs.mapPartitionsStats(spark, li).collect().map(_.nRows).sum
    val b = RowUdfs.mapPartitionsStats(spark, li.repartition(13)).collect().map(_.nRows).sum
    assert(a == b)
  }

  test("row UDF applies per-row") {
    val got = Seq("hello WORLD", "", "x").toDF("s")
      .select(RowUdfs.titleCase(col("s"))).as[String].collect().toSeq
    assert(got == Seq("Hello World", "", "X"))
  }

  test("flatMapGroups computes per-group sequential logic") {
    val orders = Seq(
      (1L, 10.0), (1L, 20.0), (1L, 30.0), (1L, 5.0),
      (2L, 9.0), (2L, 3.0)).toDF("o_custkey", "o_totalprice").coalesce(1)
    val got = RowUdfs.groupApplyRuns(spark, orders)
      .collect().map(p => p.c_custkey -> (p.n, p.maxRun)).toMap
    assert(got(1L)._1 == 4)
    assert(got(2L)._1 == 2)
    // note: group iteration order isn't guaranteed sorted; with a single
    // input partition per key here it follows insertion order
    assert(got(1L)._2 == 3)
  }
}
