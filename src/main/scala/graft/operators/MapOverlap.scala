package graft.operators

import org.apache.spark.sql.{Column, Dataset, Encoder}

/** Dask `map_overlap` (dask.dataframe.rolling [P]) — the one collection
  * primitive whose whole point is a per-partition UDF that sees rows
  * ACROSS partition boundaries: each partition is extended with the
  * last `before` rows of its predecessors and the first `after` rows
  * of its successors, the UDF runs over the extended frame, and the
  * overlap positions are trimmed from the output so every input row is
  * produced exactly once.
  *
  * Spark-first framing: everything the DECLARED surface needs from
  * map_overlap (rolling stats, shift/diff, interpolation) is a window
  * function — catalyst-planned, codegen'd, skew-managed — so this
  * operator exists for API parity: the residue of genuinely imperative
  * per-partition logic (a C library call over a contiguous buffer, a
  * stateful parser) that needs bounded lookback/lookahead. That is
  * per-partition imperative logic in the brief's sense, hence the one
  * deliberate `.rdd` drop-down; the partition-fit-in-memory contract
  * is Dask's own (each partition IS a pandas frame there).
  *
  * Plan shape: ONE range repartition + local sort (exactly what the
  * window twin's global ORDER BY pays), then one O(#partitions ×
  * overlap) boundary collect — heads/tails only, gathered with a ring
  * buffer, never a partition materialized on the driver — broadcast
  * back, and one mapPartitions pass. Boundary rows for partition i
  * accumulate across as many PRECEDING partitions as needed (an empty
  * or thin range bucket contributes what it has and the walk
  * continues), so correctness never depends on the partitioner's
  * balance — only the per-partition UDF's own memory does.
  */
object MapOverlap {

  /** Apply `f` over each partition of `ds` extended with `before`
    * trailing rows from preceding partitions and `after` leading rows
    * from following partitions, after range-partitioning into
    * `numPartitions` by `orderKey` (a total order — ties that straddle
    * a range boundary make the overlap assignment nondeterministic,
    * same caveat as Dask's divisions). `f` must be length-preserving
    * (output i corresponds to extended-input row i) — checked loudly —
    * which is what licenses trimming the overlap by position.
    */
  def mapOverlap[T: Encoder, U: Encoder: scala.reflect.ClassTag](
      ds: Dataset[T], numPartitions: Int,
      orderKey: Column, before: Int, after: Int)(
      f: IndexedSeq[T] => IndexedSeq[U]): Dataset[U] = {
    require(before >= 0 && after >= 0 && numPartitions >= 1,
      s"bad map_overlap geometry: before=$before after=$after n=$numPartitions")
    val spark = ds.sparkSession
    val sorted = ds.repartitionByRange(numPartitions, orderKey)
      .sortWithinPartitions(orderKey)
    val rdd = sorted.rdd // typed objects, partitioning/order preserved
    val np = rdd.getNumPartitions
    // per-partition boundary summary: first `after` rows + last `before`
    // rows (ring buffer) + the partition's row count — O(overlap) memory
    val bounds = rdd.mapPartitionsWithIndex { (i, it) =>
      val head = scala.collection.mutable.ArrayBuffer.empty[T]
      val ring = new Array[Any](math.max(before, 1))
      var n = 0L
      while (it.hasNext) {
        val t = it.next()
        if (head.size < after) head += t
        if (before > 0) ring((n % before).toInt) = t
        n += 1
      }
      val tail =
        if (before == 0 || n == 0L) IndexedSeq.empty[T]
        else {
          val len = math.min(n, before.toLong).toInt
          (0 until len).map(j =>
            ring(((n - len + j) % before).toInt).asInstanceOf[T])
        }
      Iterator.single(i -> ((head.toIndexedSeq, tail, n)))
    }.collect().toMap
    val bc = spark.sparkContext.broadcast(bounds)
    val outRdd = rdd.mapPartitionsWithIndex { (i, it) =>
      val b = bc.value
      // walk predecessors until `before` rows gathered: a partition
      // whose stored tail is shorter than `before` contributed ALL its
      // rows (tail length = min(size, before)), so the walk may continue
      var prep = IndexedSeq.empty[T]
      var j = i - 1
      while (j >= 0 && prep.length < before) {
        val (_, tail, _) = b(j)
        val need = before - prep.length
        prep = tail.takeRight(need) ++ prep
        j -= 1
      }
      var app = IndexedSeq.empty[T]
      j = i + 1
      while (j < np && app.length < after) {
        val (head, _, _) = b(j)
        app = app ++ head.take(after - app.length)
        j += 1
      }
      val own = it.toIndexedSeq
      val ext = prep ++ own ++ app
      val res = f(ext)
      require(res.length == ext.length,
        s"map_overlap UDF must be length-preserving: ${ext.length} rows in, " +
          s"${res.length} out (partition $i)")
      res.slice(prep.length, prep.length + own.length).iterator
    }
    spark.createDataset(outRdd)
  }
}
