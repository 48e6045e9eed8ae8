package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Monotonic-deque rolling min/max (r17 verdict #6): Spark's WindowExec
  * evaluates a rows-frame `min`/`max` by RESCANNING the frame per row —
  * O(frame) per row, a fixed 20× on the declared 20-row query but a
  * genuine scale term on wide frames (a 2000-row risk window pays 2000
  * comparisons per row). The classical sliding-window-minimum deque
  * does it in O(1) amortized: every row index enters and leaves each
  * deque at most once.
  *
  * Plan shape: ONE hash exchange on the key + ONE per-partition sort —
  * exactly the layout WindowExec pays — then a streaming mapPartitions
  * with per-key reset (each key lives wholly in one partition, so no
  * boundary carries are needed, unlike [[Ewm]]'s unbounded scans).
  *
  * Semantics match the declared `window_rolling_minmax` formulation
  * bit-for-bit (Round18Spec pins it, nulls and ties included):
  *  - the frame is the last `frame` ROWS (nulls occupy slots);
  *  - min/max IGNORE null values (a frame of only nulls emits null) —
  *    the deques simply never admit them;
  *  - NaN follows Spark's double order (greater than every value): a
  *    frame containing NaN has max = NaN; min skips it unless the
  *    frame is all-NaN — identical in the DuckDB oracle;
  *  - pandas min_periods parity: rows whose frame holds fewer than
  *    `frame` rows emit null (the `count(*) == frame` gate).
  */
object RollingDeque {

  /** Spark's double order for min/max: NaN is GREATER than every value
    * (min skips NaN unless the frame is all-NaN; max returns NaN when
    * one is present — and so does the DuckDB oracle); −0.0 and 0.0
    * compare EQUAL (primitive semantics), so ties fall to the
    * keep-oldest rule at the call sites.
    */
  private[graft] def cmp(a: Double, b: Double): Int =
    if (java.lang.Double.isNaN(a)) { if (java.lang.Double.isNaN(b)) 0 else 1 }
    else if (java.lang.Double.isNaN(b)) -1
    else if (a < b) -1 else if (a > b) 1 else 0

  /** Append `minCol`/`maxCol` (nullable double) to `df`. */
  def withRollingMinMax(df: DataFrame, by: Seq[String],
      orderCols: Seq[String], valueCol: String, frame: Int,
      minCol: String = "roll_min", maxCol: String = "roll_max"): DataFrame = {
    require(frame >= 1, s"frame must be >= 1, got $frame")
    require(by.nonEmpty && orderCols.nonEmpty, "need key and order columns")
    val keyIdx = by.map(k => df.columns.indexOf(k))
    val valIdx = df.columns.indexOf(valueCol)
    require(valIdx >= 0, s"unknown value column $valueCol")
    require(keyIdx.forall(_ >= 0), s"unknown key column among $by")
    val sortCols = (by ++ orderCols).map(col)
    val sorted = df.repartition(by.map(col): _*)
      .sortWithinPartitions(sortCols: _*)
    val outSchema = sorted.schema
      .add(minCol, DoubleType, nullable = true)
      .add(maxCol, DoubleType, nullable = true)
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    sorted.mapPartitions { it =>
      // ring buffer of the frame's values (null = missing) to know what
      // leaves; index deques hold positions of non-null values with
      // monotone values (increasing for min, decreasing for max)
      var curKey: Seq[Any] = null
      var i = 0L // rows seen in the current key
      val ring = new Array[Double](frame)
      val minDq = new java.util.ArrayDeque[Long]()
      val maxDq = new java.util.ArrayDeque[Long]()
      def valAt(idx: Long): Double = ring((idx % frame).toInt)
      it.map { r =>
        val k = EwmKeys.norm(r, keyIdx)
        if (curKey == null || k != curKey) {
          curKey = k; i = 0L; minDq.clear(); maxDq.clear()
        }
        // evict indices that fell off the frame's left edge
        val lo = i - frame + 1
        while (!minDq.isEmpty && minDq.peekFirst() < lo) minDq.pollFirst()
        while (!maxDq.isEmpty && maxDq.peekFirst() < lo) maxDq.pollFirst()
        if (!r.isNullAt(valIdx)) {
          val x = r.getAs[Number](valIdx).doubleValue()
          ring((i % frame).toInt) = x
          // pop STRICTLY-dominated tails only, under Spark's double
          // order (NaN greater than everything — primitive comparisons
          // are all-false on NaN and would freeze a NaN at the min
          // front forever, where Spark's min skips it; r18 review #6).
          // Ties are KEPT so the front stays the OLDEST extremum,
          // matching the forward-scan accumulator's first-encountered
          // tie-keep; each index still enters/leaves once — O(1)/row.
          while (!minDq.isEmpty && RollingDeque.cmp(valAt(minDq.peekLast()), x) > 0)
            minDq.pollLast()
          while (!maxDq.isEmpty && RollingDeque.cmp(valAt(maxDq.peekLast()), x) < 0)
            maxDq.pollLast()
          minDq.addLast(i)
          maxDq.addLast(i)
        }
        val full = i >= frame - 1 // count(*) over the frame == frame
        val mn: Any = if (full && !minDq.isEmpty) valAt(minDq.peekFirst()) else null
        val mx: Any = if (full && !maxDq.isEmpty) valAt(maxDq.peekFirst()) else null
        i += 1
        Row.fromSeq(r.toSeq :+ mn :+ mx)
      }
    }
  }
}
