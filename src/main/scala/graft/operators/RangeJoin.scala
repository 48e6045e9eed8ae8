package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed point-in-interval join — the BIG-BIG range join.
  *
  * `join_range_theta` (queries/Joins.scala) covers the classic
  * small-dim range join: Spark's only native non-equi strategy is a
  * nested-loop compare, so it is issued broadcast-only and is an
  * anti-pattern the moment BOTH sides are large. This operator is the
  * scale path (the technique behind Databricks' range-join
  * optimization and the interval joins in Flink/KDB): discretize the
  * range dimension into fixed-width buckets, explode each interval
  * into the buckets it covers, tag each point with the ONE bucket that
  * contains it, equi-join on the bucket id, and post-filter the exact
  * containment predicate. The O(|P|·|I|) nested loop becomes a
  * shuffle-hash equi-join whose cost is O(|P| + Σ interval spans +
  * true matches) — every stage partitions by bucket id, so it shards
  * across a cluster like any other equi-join (AQE handles bucket skew
  * the same way it handles any key skew).
  *
  * No dedup stage: a point lives in exactly one bucket, so each
  * (point, interval) pair meets exactly once — unlike interval×interval
  * overlap joins, which need a pair-to-canonical-bucket rule.
  *
  * `bucketWidth` tunes the explode-vs-selectivity trade: buckets much
  * wider than the typical interval approach one-row explodes but admit
  * more false candidates; much narrower multiplies interval copies.
  * Width ≈ the median interval span is the usual sweet spot. A
  * max-span guard fails LOUDLY (raise_error) on intervals that would
  * explode more than `maxBucketsPerInterval` copies — a hostile
  * open-ended interval must not silently materialize millions of rows.
  */
object RangeJoin {

  /** Inner point-in-interval join on LONG range columns (callers
    * convert timestamps via `unix_micros`/`unix_seconds` first; integer
    * bucket ids stay exact where double floors would not be past 2^53).
    * Emits all columns of both inputs; `ptCol` must satisfy
    * `startCol <= ptCol <= endCol` (inclusive both ends). Column names
    * must be disjoint between the two inputs (same contract as every
    * Spark equi-join without a USING column).
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // floor division, exact on longs for any sign: rebase by the nonneg
    // remainder (pmod) so the numerator is exactly divisible, and divide
    // as DECIMAL — long `/` in Spark is double division, which goes
    // inexact past 2^53 (epoch micros are already 2^50)
    def fdiv(c: Column): Column =
      ((c - pmod(c, lit(bucketWidth))).cast("decimal(38,0)") / bucketWidth)
        .cast("long")
    val span = fdiv(col(endCol)) - fdiv(col(startCol)) + 1
    val guardMsg = concat(
      lit(s"rangeJoin: interval spans more than $maxBucketsPerInterval " +
        s"buckets of width $bucketWidth ("),
      col("__span").cast("string"),
      lit(" buckets); widen bucketWidth or split the interval"))
    val ib = intervals
      .withColumn("__span", when(col(startCol) <= col(endCol), span)
        .otherwise(lit(0L)))
      .withColumn("__span",
        when(col("__span") > maxBucketsPerInterval, raise_error(guardMsg))
          .otherwise(col("__span")))
      // empty (start > end) intervals explode to zero rows, not an error
      .filter(col("__span") > 0)
      .withColumn("__bucket",
        explode(sequence(fdiv(col(startCol)), fdiv(col(endCol)))))
      .drop("__span")
    val pb = points.withColumn("__bucket", fdiv(col(ptCol)))
    pb.join(ib, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}
