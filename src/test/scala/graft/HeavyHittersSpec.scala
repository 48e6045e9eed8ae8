package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.HeavyHitters

/** SpaceSaving sketch guarantees under capacity pressure (the exact,
  * capacity>=distinct case is hash-checked by the agg_heavy_hitters
  * oracle).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tokens = spark.read.parquet(s"$sf/documents.parquet")
    .select(explode(split(lower(col("text")), "\\s+")).as("w"))
    .filter(length(col("w")) > 0)

  private def sketch(capacity: Int): Map[String, Long] =
    tokens.agg(HeavyHitters.columnFor(col("w"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .as[(String, Long)].collect().toMap

  private lazy val exact: Map[String, Long] =
    tokens.groupBy("w").agg(count(lit(1))).as[(String, Long)].collect().toMap

  test("exact when capacity exceeds distinct count") {
    val got = sketch(capacity = exact.size + 10)
    assert(got == exact)
  }

  test("under pressure: superset of true heavy hitters, counts never undershoot") {
    val cap = 20
    val n = exact.values.sum
    val got = sketch(cap)
    assert(got.size <= cap)
    // every item with true frequency > n/cap must appear
    val mustHave = exact.filter(_._2 > n / cap).keySet
    val missing = mustHave -- got.keySet
    assert(missing.isEmpty, s"missed heavy hitters: $missing")
    // estimates are overestimates
    got.foreach { case (k, c) =>
      assert(c >= exact.getOrElse(k, 0L), s"undershoot for $k")
    }
  }
}
