package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact linear-interpolation quantiles (`quantile_cont`) by
  * distributed sort + global-offset selection.
  *
  * Spark's exact `percentile` aggregate accumulates a value→count map
  * per partition and merges the maps on ONE reducer: fine when the
  * value domain is small, memory-unbounded on high-cardinality doubles
  * — at 100 TB the buffer IS the column. This operator instead
  * range-partitions and sorts the column (a fully parallel shuffle),
  * computes per-partition counts, turns each requested probability into
  * a global offset, and fetches only the two bracketing elements per
  * quantile from the partitions that own them. Nothing ever
  * concentrates: the driver sees one count and ≤ 2·|probs| doubles.
  *
  * Interpolation is the `quantile_cont` definition both engines share:
  * `v[floor(h)] + (h - floor(h)) · (v[ceil(h)] - v[floor(h)])` with
  * `h = (n-1)·p` — identical doubles to Spark's `percentile` on
  * NaN-free data and to DuckDB's `quantile_cont` (asserted in
  * QuantilesSpec; see [[quantiles]] for the NaN rule).
  */
object ExactQuantiles {

  /** Exact quantiles of `df.col(c)` at `probs`. Nulls AND NaNs are
    * dropped — note the NaN rule diverges from Spark's `percentile`,
    * which sorts NaN as greatest and lets it poison upper quantiles;
    * dropping matches what a stats profile wants and what the DuckDB
    * `quantile_cont` oracle does. Returns NaN entries when the column
    * is empty.
    */
  def quantiles(df: DataFrame, c: String, probs: Seq[Double]): Seq[Double] = {
    require(probs.forall(p => p >= 0.0 && p <= 1.0), "probabilities must be in [0, 1]")
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = df
      .select(col(c).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
      .repartitionByRange(parts, col("v"))
      .sortWithinPartitions("v")
    val rdd = sorted.select("v").rdd.map(_.getDouble(0))
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // per-partition counts -> global offset of each partition's head
      // (manual Long loop: Iterator.size returns Int and would silently
      // wrap on >2^31-row partitions — the scale this operator targets)
      val counts = rdd.mapPartitions { it =>
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }; Iterator(c)
      }.collect()
      val n = counts.sum
      if (n == 0) return probs.map(_ => Double.NaN)
      val starts = counts.scanLeft(0L)(_ + _) // starts(i) = first global idx in partition i
      // global offsets of the bracketing elements for every quantile
      val wanted: Seq[Long] = probs.flatMap { p =>
        val h = (n - 1) * p
        Seq(math.floor(h).toLong, math.ceil(h).toLong)
      }.distinct.sorted
      // one fetch job: each partition emits only the wanted offsets it owns
      val wantedB = spark.sparkContext.broadcast(wanted.toArray)
      val fetched: Map[Long, Double] = rdd
        .mapPartitionsWithIndex { (i, it) =>
          val lo = starts(i)
          val hi = starts(i) + counts(i)
          val mine = wantedB.value.filter(o => o >= lo && o < hi)
          if (mine.isEmpty) Iterator.empty
          else {
            var idx = lo
            val found = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
            var next = 0
            while (it.hasNext && next < mine.length) {
              val v = it.next()
              if (idx == mine(next)) { found += ((mine(next), v)); next += 1 }
              idx += 1
            }
            found.iterator
          }
        }
        .collect().toMap
      probs.map { p =>
        val h = (n - 1) * p
        val lo = fetched(math.floor(h).toLong)
        val hi = fetched(math.ceil(h).toLong)
        lo + (h - math.floor(h)) * (hi - lo)
      }
    } finally rdd.unpersist(false)
  }
}
