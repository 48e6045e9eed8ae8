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
  * No dedup stage in the point form: a point lives in exactly one
  * bucket, so each (point, interval) pair meets exactly once. The
  * interval×interval form ([[intervalOverlap]]) gets the same
  * exactly-once property from its canonical-bucket rule instead.
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
    val pb = points.withColumn("__bucket", fdiv(col(ptCol), bucketWidth))
    pb.join(explodeToBuckets(intervals, startCol, endCol, bucketWidth,
        maxBucketsPerInterval), Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Inner interval-OVERLAP join on LONG range columns: all (left,
    * right) pairs with `lStart <= rEnd && rStart <= lEnd` (inclusive
    * ends, so touching endpoints overlap). The interval×interval
    * sibling of [[pointInInterval]] — meeting conflicts, outage windows
    * × incident windows, segment intersection — and the shape where the
    * naive bucket join DOUBLE-COUNTS: an overlapping pair shares every
    * bucket their overlap region covers. The canonical-bucket rule
    * dedups WITHOUT a distinct: a pair is admitted only in the bucket
    * containing `max(lStart, rStart)` — the overlap's start, which by
    * definition lies inside BOTH intervals, so both sides exploded a
    * copy into exactly that bucket and each true pair meets once.
    * Column names must be disjoint between the two inputs.
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val lb = explodeToBuckets(left, lStart, lEnd, bucketWidth, maxBucketsPerInterval)
    val rb = explodeToBuckets(right, rStart, rEnd, bucketWidth, maxBucketsPerInterval)
    lb.join(rb, Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") ===
        fdiv(greatest(col(lStart), col(rStart)), bucketWidth))
      .drop("__bucket")
  }

  /** Floor division, exact on longs for any sign: rebase by the nonneg
    * remainder (pmod) so the numerator is exactly divisible, and divide
    * as DECIMAL — long `/` in Spark is double division, which goes
    * inexact past 2^53 (epoch micros are already 2^50).
    */
  private def fdiv(c: Column, bucketWidth: Long): Column =
    ((c - pmod(c, lit(bucketWidth))).cast("decimal(38,0)") / bucketWidth)
      .cast("long")

  /** One row per (interval, covering bucket), with the max-span guard
    * failing LOUDLY and empty (start > end) intervals exploding to zero
    * rows rather than erroring.
    */
  private def explodeToBuckets(intervals: DataFrame, startCol: String,
      endCol: String, bucketWidth: Long, maxBucketsPerInterval: Int): DataFrame = {
    val span = fdiv(col(endCol), bucketWidth) - fdiv(col(startCol), bucketWidth) + 1
    val guardMsg = concat(
      lit(s"rangeJoin: interval spans more than $maxBucketsPerInterval " +
        s"buckets of width $bucketWidth ("),
      col("__span").cast("string"),
      lit(" buckets); widen bucketWidth or split the interval"))
    intervals
      .withColumn("__span", when(col(startCol) <= col(endCol), span)
        .otherwise(lit(0L)))
      .withColumn("__span",
        when(col("__span") > maxBucketsPerInterval, raise_error(guardMsg))
          .otherwise(col("__span")))
      .filter(col("__span") > 0)
      .withColumn("__bucket",
        explode(sequence(fdiv(col(startCol), bucketWidth),
          fdiv(col(endCol), bucketWidth))))
      .drop("__span")
  }
}
