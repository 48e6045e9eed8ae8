package graft

import org.apache.spark.sql.functions._
import graft.operators.ExactQuantiles

/** Distributed-selection quantiles must be bit-identical to Spark's
  * exact `percentile` aggregate (the quantile_cont definition) — on
  * duplicates, tiny inputs, endpoints, and the fixture column the
  * describe query uses.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.0, 0.25, 0.5, 0.75, 1.0)

  private def reference(df: org.apache.spark.sql.DataFrame, c: String): Seq[Double] =
    df.agg(percentile(col(c), array(probs.map(lit): _*)))
      .head().getSeq[Double](0)

  private def check(data: Seq[Double]): Unit = {
    val df = data.toDF("v").repartition(5)
    assert(ExactQuantiles.quantiles(df, "v", probs) == reference(df, "v"))
  }

  test("matches percentile() on randoms, duplicates, singletons, endpoints") {
    val rnd = new scala.util.Random(7)
    check(Seq.fill(999)(rnd.nextDouble() * 1000))
    check(Seq.fill(500)(rnd.nextInt(10).toDouble)) // heavy duplicates
    check(Seq(42.0))
    check(Seq(1.0, 2.0))
    check((1 to 100).map(_.toDouble))
  }

  test("matches percentile() on the fixture column and drops nulls") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(ExactQuantiles.quantiles(li, "l_extendedprice", probs) ==
      reference(li, "l_extendedprice"))
    val withNulls = Seq[(java.lang.Double)](1.0, null, 3.0, null, 2.0).toDF("v")
    assert(ExactQuantiles.quantiles(withNulls, "v", Seq(0.5)) == Seq(2.0))
  }

  test("empty input yields NaN") {
    val empty = Seq.empty[Double].toDF("v")
    assert(ExactQuantiles.quantiles(empty, "v", Seq(0.5)).forall(_.isNaN))
  }

  test("weighted median equals the expand-and-scan reference on the fixture") {
    // reference: per group, walk prices ascending accumulating integer
    // weight; the weighted median is the first price whose running mass
    // reaches half the total (2*cum >= tot in integer space)
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long"))
      .as[(String, Double, Long)].collect()
    val expect = rows.groupBy(_._1).map { case (rf, rs) =>
      val sorted = rs.sortBy(_._2)
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val median = sorted.find { r => cum += r._3; cum * 2 >= tot }.get._2
      rf -> ((median, tot))
    }
    val got = graft.queries.Aggregations.aggWeightedMedian(spark, sf)
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect, s"got $got expect $expect")
  }
}
