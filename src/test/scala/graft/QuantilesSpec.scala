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

  test("weighted quantiles: expand-and-scan reference at q=10/50/90; p50 = median") {
    // same walk as the median reference, generalized: first value whose
    // running mass satisfies cum*den >= tot*num
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long"))
      .as[(String, Double, Long)].collect()
    val qs = Seq((1L, 10L), (1L, 2L), (9L, 10L))
    val expect = rows.groupBy(_._1).map { case (rf, rs) =>
      val sorted = rs.sortBy(_._2)
      val tot = sorted.map(_._3).sum
      val picks = qs.map { case (num, den) =>
        var cum = 0L
        sorted.find { r => cum += r._3; cum * den >= tot * num }.get._2
      }
      rf -> ((picks, tot))
    }
    val got = graft.queries.Aggregations.aggWeightedQuantile(spark, sf)
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> ((Seq(r._2, r._3, r._4), r._5))).toMap
    assert(got == expect, s"got $got expect $expect")
    // p50 coincides with the dedicated weighted median by construction
    val med = graft.queries.Aggregations.aggWeightedMedian(spark, sf)
      .as[(String, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    got.foreach { case (rf, (picks, _)) => assert(picks(1) == med(rf)) }
  }

  test("weighted quantiles: hand-computed ties and boundary masses") {
    // weights: a:1, b:3, c:6 -> tot=10; cum a=1 b=4 c=10
    // p10: cum*10 >= 10 -> a (exact boundary at the first row)
    // p40: cum*10 >= 40 -> b (exact boundary mid-group)
    // p41: cum*100 >= 410 -> c (just past the boundary)
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 3L), ("g", 3.0, 6L))
      .toDF("grp", "v", "w")
    val got = graft.queries.Aggregations
      .weightedQuantiles(df, "grp", "v", "w",
        Seq((1, 10, "p10"), (2, 5, "p40"), (41, 100, "p41"), (1, 1, "p100")))
      .as[(String, Double, Double, Double, Double, Long)].head()
    assert(got == (("g", 1.0, 2.0, 3.0, 3.0, 10L)))
  }
}
