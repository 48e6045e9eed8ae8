package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Normalized key for run detection, shared by both Ewm scans: Seq[Any]
  * equality is REFERENCE equality for Array[Byte] (BinaryType) and
  * false for NaN==NaN, so raw values would split such keys into
  * per-row runs; wrap both so equality matches Window.partitionBy's
  * grouping semantics. A top-level object so closures reach it as a
  * static module access instead of capturing the (non-serializable)
  * enclosing Ewm module through a this-call.
  */
private[operators] object EwmKeys {
  def norm(r: Row, keyIdx: Seq[Int]): Seq[Any] = keyIdx.map { i =>
    r.get(i) match {
      case b: Array[Byte] => b.toSeq
      case d: java.lang.Double if d.isNaN => Ewm.NanKey
      case f: java.lang.Float if f.isNaN => Ewm.NanKey
      case v => v
    }
  }
}

/** Exponentially weighted mean over per-key ordered streams of ANY
  * length — the scale path for `Windows.windowEwm`, whose prefix-sum
  * phrasing overflows double once a key's stream passes ~708/-ln(1-α)
  * rows (~6.7k at α=0.1).
  *
  * The recursion `num_t = x_t + (1-α)·num_{t-1}` only ever MULTIPLIES by
  * (1-α) when run forward, so a sequential scan has no range problem at
  * any length; the denominator Σ(1-α)^i has the closed form
  * (1-(1-α)^(t+1))/α, which underflows harmlessly to 1/α. What makes a
  * sequential recursion distributable is that appending a block of rows
  * acts on the carry as an AFFINE map `num -> (1-α)^m · num + b`, and
  * affine maps compose associatively — so:
  *
  *  1. range-partition + sort by (key, order): each key is a run of
  *     contiguous rows, a hot key spanning as many partitions as it
  *     needs (nothing pins one executor);
  *  2. pass 1 scans each partition once and emits ONE summary per
  *     partition-boundary key run (row count m, block value b) — at
  *     most two rows per partition regardless of data size;
  *  3. the driver folds the boundary summaries per key in partition
  *     order (O(#partitions) work — the same bounded-driver-step shape
  *     as Ann's k-means fit) into an entry carry for every partition
  *     whose first run continues a key from the partition before;
  *  4. pass 2 rescans with the broadcast entry carries and emits the
  *     row-level ewm.
  *
  * Cost: one range-partition shuffle + sort, persisted once (disk-backed
  * at scale) and scanned twice; the cross-partition state is
  * O(#partitions), not O(rows). Null values contribute nothing to the
  * numerator but still advance the denominator's weight sum — exactly
  * [[graft.queries.Windows.windowEwm]]'s `sum(x·w)/sum(w)` ignoreNulls
  * semantics (equality asserted in ExtrasSpec, including a single-key
  * stream long past windowEwm's overflow horizon).
  */
object Ewm {

  private case class RunSummary(pid: Int, key: Seq[Any], firstRun: Boolean,
    lastRun: Boolean, m: Long, b: Double)

  /** Sentinel for NaN key values (NaN != NaN would break run detection;
    * a typed singleton cannot collide with real column values).
    */
  private[operators] case object NanKey extends Serializable


  /** Adds `outCol` (the running ewm of `valueCol`) to `df`.
    *
    * @param orderCols total per-key order (include a unique tiebreak).
    */
  def withEwm(df: DataFrame, by: Seq[String], orderCols: Seq[String],
      valueCol: String, alpha: Double, outCol: String = "ewm"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(by.nonEmpty && orderCols.nonEmpty, "need key and order columns")
    val beta = 1.0 - alpha
    val spark = df.sparkSession
    val sortCols = (by ++ orderCols).map(col)
    val keyIdx = by.map(k => df.columns.indexOf(k))
    val valIdx = df.columns.indexOf(valueCol)
    require(valIdx >= 0, s"unknown value column $valueCol")
    require(keyIdx.forall(_ >= 0), s"unknown key column among $by")

    // one shuffle+sort, reused by both passes. localCheckpoint (not
    // persist): the range partitioner SAMPLES its bounds, so a
    // recomputation after cache release would draw different partition
    // boundaries while the broadcast carries stay keyed to the old
    // pids — silently wrong values. The checkpoint freezes the layout;
    // after release-after-action a second materialization fails loudly
    // (checkpoint block gone) instead of lying.
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()

    def keyOf(r: Row): Seq[Any] = EwmKeys.norm(r, keyIdx)

    // pass 1: per-partition boundary summaries (first and last key run)
    val summaries: Array[RunSummary] = sorted.rdd.mapPartitionsWithIndex {
      (pid, it) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[RunSummary]
        var curKey: Seq[Any] = null
        var m = 0L
        var b = 0.0
        var runIsFirst = true
        def close(last: Boolean): Unit =
          if (curKey != null && (runIsFirst || last))
            out += RunSummary(pid, curKey, runIsFirst, last, m, b)
        while (it.hasNext) {
          val r = it.next()
          val k = keyOf(r)
          if (curKey == null || k != curKey) {
            close(last = false)
            if (curKey != null) runIsFirst = false
            curKey = k; m = 0L; b = 0.0
          }
          m += 1
          b = (if (r.isNullAt(valIdx)) 0.0
               else r.getAs[Number](valIdx).doubleValue()) + beta * b
        }
        close(last = true)
        out.iterator
    }.collect()

    // driver fold, O(#partitions): walk each key's boundary runs in
    // partition order; a partition's first run inherits the composed
    // carry of every preceding run of the same key. Range partitioning
    // keeps a key's rows contiguous across the partition sequence, so a
    // pid gap between two runs of one key can only mean EMPTY partitions
    // in between — still a continuation (no adjacency check).
    val entries = scala.collection.mutable.HashMap.empty[Int, (Double, Long)]
    summaries.groupBy(_.key).foreach { case (_, runs) =>
      var num = 0.0
      var cnt = 0L
      runs.sortBy(_.pid).foreach { s =>
        if (s.firstRun && cnt > 0) entries(s.pid) = (num, cnt)
        num = s.b + math.pow(beta, s.m.toDouble) * num
        cnt += s.m
      }
    }
    val entriesBc = spark.sparkContext.broadcast(entries.toMap)

    // pass 2: rescan with seeded carries, emit the per-row ewm
    val outSchema = sorted.schema.add(outCol, DoubleType, nullable = false)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val result = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val seed = entriesBc.value.get(pid)
      var curKey: Seq[Any] = null
      var isFirstRun = true
      var num = 0.0
      var cnt = 0L
      it.map { r =>
        val k = keyOf(r)
        if (curKey == null || k != curKey) {
          if (curKey != null) isFirstRun = false
          curKey = k
          val s = if (isFirstRun) seed else None
          num = s.map(_._1).getOrElse(0.0)
          cnt = s.map(_._2).getOrElse(0L)
        }
        num = (if (r.isNullAt(valIdx)) 0.0
               else r.getAs[Number](valIdx).doubleValue()) + beta * num
        cnt += 1
        // closed-form weight sum; the pow underflows to 0 for long
        // streams, converging the denominator to 1/alpha exactly
        val den = (1.0 - math.pow(beta, cnt.toDouble)) / alpha
        Row.fromSeq(r.toSeq :+ num / den)
      }
    }
    CacheLifecycle.releaseAfterAction(result, Seq(sorted))
  }

  private case class VarRunSummary(pid: Int, key: Seq[Any], firstRun: Boolean,
    lastRun: Boolean, m: Long, nn: Long, bw: Double, bww: Double, bx: Double,
    bxx: Double)

  /** Exponentially weighted UNBIASED sample variance (pandas
    * `ewm(alpha).var(bias=False)`) over per-key ordered streams of ANY
    * length — the scale path past `Windows.windowEwmVar`'s 131-row
    * DECIMAL-lattice horizon (r16 verdict #3 / ADVICE).
    *
    * The lattice query phrases the variance from four GROWING-weight
    * prefix sums (w_i = (1−α)^−(i−1)), which is what overflows; run the
    * same four sums with DECAYED weights (newest weight 1) and they are
    * bounded at any length — Σw ≤ 1/α, Σw² ≤ 1/(1−β²) — and the
    * reliability-weighted variance `(Sw·Sxx − Sx²)/(Sw² − Sww)` is
    * HOMOGENEOUS of degree 0 in the weights (numerator and denominator
    * are both degree-2), so decayed and growing weights define the
    * identical statistic. Each decayed sum obeys a forward recursion
    * `num_t = a_t + d·num_{t−1}` (d = β for Sw/Sx/Sxx, d = β² for Sww;
    * a_t = 1, x_t, x_t² respectively), and appending an m-row block
    * acts on each carry as the AFFINE map `num → d^m·num + b` — the
    * same associative-composition device as [[withEwm]], just four
    * channels wide: one range-partition + sort, pass 1 emits ≤ 2
    * boundary summaries per partition, the driver folds them in
    * O(#partitions), pass 2 rescans with broadcast entry carries.
    *
    * Null values contribute nothing to Sx/Sxx but still advance every
    * decay and the Sw/Sww weight sums — exactly the lattice query's
    * `sum(x·w)/sum(w)`-family null semantics, INCLUDING the all-null
    * prefix: a window sum over zero non-null terms is NULL (not 0), so
    * rows before a key's first non-null value emit null — a non-null
    * count rides the carries to reproduce that (r17 review finding; a
    * 0.0 here would invent a variance the lattice and the oracle both
    * refuse to state). A key's first row (and any zero-spread prefix
    * where Sw² = Sww, i.e. n = 1) emits null, matching the lattice's
    * `den > 0` gate.
    */
  def withEwmVar(df: DataFrame, by: Seq[String], orderCols: Seq[String],
      valueCol: String, alpha: Double, outCol: String = "ewm_var"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(by.nonEmpty && orderCols.nonEmpty, "need key and order columns")
    val beta = 1.0 - alpha
    val beta2 = beta * beta
    val spark = df.sparkSession
    val sortCols = (by ++ orderCols).map(col)
    val keyIdx = by.map(k => df.columns.indexOf(k))
    val valIdx = df.columns.indexOf(valueCol)
    require(valIdx >= 0, s"unknown value column $valueCol")
    require(keyIdx.forall(_ >= 0), s"unknown key column among $by")

    // one shuffle+sort frozen by localCheckpoint — same rationale as
    // withEwm: the range partitioner samples its bounds, and the
    // broadcast carries are keyed to THIS layout's pids
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()

    def keyOf(r: Row): Seq[Any] = EwmKeys.norm(r, keyIdx)
    def xOf(r: Row): Double =
      if (r.isNullAt(valIdx)) 0.0 else r.getAs[Number](valIdx).doubleValue()

    // pass 1: per-partition boundary summaries, four block folds
    val summaries: Array[VarRunSummary] = sorted.rdd.mapPartitionsWithIndex {
      (pid, it) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[VarRunSummary]
        var curKey: Seq[Any] = null
        var m = 0L
        var nn = 0L
        var bw = 0.0; var bww = 0.0; var bx = 0.0; var bxx = 0.0
        var runIsFirst = true
        def close(last: Boolean): Unit =
          if (curKey != null && (runIsFirst || last))
            out += VarRunSummary(pid, curKey, runIsFirst, last, m, nn, bw, bww, bx, bxx)
        while (it.hasNext) {
          val r = it.next()
          val k = keyOf(r)
          if (curKey == null || k != curKey) {
            close(last = false)
            if (curKey != null) runIsFirst = false
            curKey = k; m = 0L; nn = 0L; bw = 0.0; bww = 0.0; bx = 0.0; bxx = 0.0
          }
          m += 1
          if (!r.isNullAt(valIdx)) nn += 1
          val x = xOf(r)
          bw = 1.0 + beta * bw
          bww = 1.0 + beta2 * bww
          bx = x + beta * bx
          bxx = x * x + beta * bxx
        }
        close(last = true)
        out.iterator
    }.collect()

    // driver fold, O(#partitions): compose each channel's affine maps
    // in partition order (see withEwm for why pid gaps are still
    // continuations under range partitioning)
    val entries = scala.collection.mutable.HashMap.empty[Int, (Double, Double, Double, Double, Long, Long)]
    summaries.groupBy(_.key).foreach { case (_, runs) =>
      var sw = 0.0; var sww = 0.0; var sx = 0.0; var sxx = 0.0
      var cnt = 0L
      var nnc = 0L
      runs.sortBy(_.pid).foreach { s =>
        if (s.firstRun && cnt > 0) entries(s.pid) = (sw, sww, sx, sxx, cnt, nnc)
        val dm = math.pow(beta, s.m.toDouble)
        val dm2 = math.pow(beta2, s.m.toDouble)
        sw = s.bw + dm * sw
        sww = s.bww + dm2 * sww
        sx = s.bx + dm * sx
        sxx = s.bxx + dm * sxx
        cnt += s.m
        nnc += s.nn
      }
    }
    val entriesBc = spark.sparkContext.broadcast(entries.toMap)

    // pass 2: rescan with seeded carries, emit the per-row variance
    val outSchema = sorted.schema.add(outCol, DoubleType, nullable = true)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val result = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val seed = entriesBc.value.get(pid)
      var curKey: Seq[Any] = null
      var isFirstRun = true
      var sw = 0.0; var sww = 0.0; var sx = 0.0; var sxx = 0.0
      var nn = 0L
      it.map { r =>
        val k = keyOf(r)
        if (curKey == null || k != curKey) {
          if (curKey != null) isFirstRun = false
          curKey = k
          val s = if (isFirstRun) seed else None
          sw = s.map(_._1).getOrElse(0.0)
          sww = s.map(_._2).getOrElse(0.0)
          sx = s.map(_._3).getOrElse(0.0)
          sxx = s.map(_._4).getOrElse(0.0)
          nn = s.map(_._6).getOrElse(0L)
        }
        if (!r.isNullAt(valIdx)) nn += 1
        val x = xOf(r)
        sw = 1.0 + beta * sw
        sww = 1.0 + beta2 * sww
        sx = x + beta * sx
        sxx = x * x + beta * sxx
        val den = sw * sw - sww
        // nn == 0: the lattice's Sx/Sxx are window sums over zero
        // non-null terms — NULL, not 0 — so the variance is too
        val v: Any = if (den > 0 && nn > 0) (sw * sxx - sx * sx) / den else null
        Row.fromSeq(r.toSeq :+ v)
      }
    }
    CacheLifecycle.releaseAfterAction(result, Seq(sorted))
  }
}
