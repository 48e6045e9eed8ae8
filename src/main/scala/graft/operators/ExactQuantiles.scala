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
  def quantiles(df: DataFrame, c: String, probs: Seq[Double]): Seq[Double] =
    quantilesMulti(df, Seq(c), probs)(c)

  /** Exact quantiles for SEVERAL columns in one scan, one range
    * shuffle, and two follow-up jobs — instead of repeating the
    * sort-and-select machinery per column (8 columns ≈ 24 jobs before;
    * 4 total now, the r6 advice item). The columns are melted to
    * `(name, v)` rows, range-partitioned and sorted on `(name, v)` —
    * so each column occupies a contiguous run of the global order and
    * its within-column offsets are recoverable from per-partition
    * per-column run counts. Driver traffic stays bounded:
    * #partitions × #cols run counts plus ≤ 2·|probs|·|cols| doubles.
    */
  def quantilesMulti(df: DataFrame, cols: Seq[String],
      probs: Seq[Double]): Map[String, Seq[Double]] = {
    require(probs.forall(p => p >= 0.0 && p <= 1.0), "probabilities must be in [0, 1]")
    // a duplicated name would map two ci indices to one name, silently
    // interleaving that name's per-partition runs in the offset accounting
    require(cols.distinct.size == cols.size, s"duplicate column in $cols")
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    // columns ride as an INT index, not the name string: the range
    // shuffle + sort over #rows×#cols melted pairs is the operator's
    // whole cost, and an int key sorts ~2× faster than a string key
    val stacked = df
      .select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("ci"), col(c).cast("double").as("v")) }: _*)).as("s"))
      .select(col("s.ci").as("ci"), col("s.v").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
      .repartitionByRange(parts, col("ci"), col("v"))
      .sortWithinPartitions("ci", "v")
    // InternalRow -> specialized (Int, Double) tuples, never external
    // Rows (r18 optimization): the old `.rdd` path allocated a Row plus
    // a (String, Double) tuple per melted value — for #rows x #cols
    // values that conversion and its GC churn rivaled the sort itself.
    // toRdd reads the UnsafeRow buffers in place (fields are extracted
    // immediately, nothing retains the reused row), and Tuple2[Int,
    // Double] is @specialized - no boxing anywhere on the hot path.
    // Column names reappear only in the driver-side result assembly.
    val rdd = stacked.queryExecution.toRdd
      .mapPartitions(_.map(r => (r.getInt(0), r.getDouble(1))),
        preservesPartitioning = true)
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // per-partition (ci, runLength) in encounter order (columns are
      // contiguous within a sorted partition). Manual Long counters:
      // Iterator.size is Int and would wrap past 2^31 rows.
      val runs: Array[(Int, Array[(Int, Long)])] = rdd.mapPartitionsWithIndex { (i, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        var cur: Int = -1
        var c = 0L
        while (it.hasNext) {
          val n = it.next()._1
          if (n != cur) { if (cur != -1) buf += ((cur, c)); cur = n; c = 0L }
          c += 1L
        }
        if (cur != -1) buf += ((cur, c))
        Iterator((i, buf.toArray))
      }.collect()
      // totals and, per partition, each column-run's start offset WITHIN
      // its column's global order (accumulate per name across partitions
      // in partition-index order — the global sort order)
      val totals = scala.collection.mutable.Map.empty[Int, Long]
      // ci -> (start, len); sized from the RDD (the range partitioner
      // may emit fewer partitions than requested on tiny inputs)
      val runStarts = Array.fill(rdd.getNumPartitions)(Map.empty[Int, (Long, Long)])
      runs.sortBy(_._1).foreach { case (i, rs) =>
        runStarts(i) = rs.map { case (n, len) =>
          val start = totals.getOrElse(n, 0L)
          totals(n) = start + len
          n -> (start, len)
        }.toMap
      }
      // bracketing within-column offsets per column
      val wanted: Map[Int, Array[Long]] = cols.indices.map { c =>
        val n = totals.getOrElse(c, 0L)
        c -> probs.flatMap { p =>
          val h = (n - 1) * p
          Seq(math.floor(h).toLong, math.ceil(h).toLong)
        }.distinct.sorted.toArray
      }.toMap
      val wantedB = spark.sparkContext.broadcast(wanted)
      val startsB = spark.sparkContext.broadcast(runStarts)
      // one fetch job: each partition walks its runs and emits only the
      // wanted (name, offset) pairs it owns
      val fetched: Map[(Int, Long), Double] = rdd
        .mapPartitionsWithIndex { (i, it) =>
          val myRuns = startsB.value(i)
          val found = scala.collection.mutable.ArrayBuffer.empty[((Int, Long), Double)]
          var cur: Int = -1
          var idx = 0L
          var mine: Array[Long] = Array.emptyLongArray
          var next = 0
          while (it.hasNext) {
            val (n, v) = it.next()
            if (n != cur) {
              cur = n
              val (start, len) = myRuns(n)
              idx = start
              mine = wantedB.value.getOrElse(n, Array.emptyLongArray)
                .filter(o => o >= start && o < start + len)
              next = 0
            }
            if (next < mine.length && idx == mine(next)) {
              found += (((cur, idx), v)); next += 1
            }
            idx += 1L
          }
          found.iterator
        }
        .collect().toMap
      cols.indices.map { ci =>
        val n = totals.getOrElse(ci, 0L)
        cols(ci) -> probs.map { p =>
          if (n == 0) Double.NaN
          else {
            val h = (n - 1) * p
            val lo = fetched((ci, math.floor(h).toLong))
            val hi = fetched((ci, math.ceil(h).toLong))
            lo + (h - math.floor(h)) * (hi - lo)
          }
        }
      }.toMap
    } finally rdd.unpersist(false)
  }
}
