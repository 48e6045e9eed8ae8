package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Packed k-slot running `last(ignoreNulls)` for the one-pass k-stream
  * as-of join ([[graft.operators.AsofJoin.backwardMulti]]).
  *
  * The naive phrasing — k separate `last(__pᵢ, ignoreNulls)` window
  * functions over one shared window — is shuffle-optimal (Catalyst
  * collapses them into ONE Window operator after ONE keyed exchange)
  * but CPU-linear in k: WindowExec's AggregateProcessor evaluates every
  * function's update expression against every row of the |L| + Σ|Rᵢ|
  * union, k×N updates of which (k−1)×N are no-ops by construction,
  * because each union row carries at most ONE non-null payload (its own
  * stream's). Measured in STRESS.md round 14: local wall 0.69 → 3.37 s
  * as k goes 2 → 8 on identical total rows, while the chained form
  * stays flat.
  *
  * This kernel exploits that invariant directly: ONE window function
  * whose buffer is an Array of k payload slots, with the row's stream
  * id (`sid`, null on label rows) selecting the single slot to read and
  * write — one state touch per row, ZERO payload evaluations on label
  * rows (the bulk of a feature-store read), so the per-row cost is O(1)
  * in k and the whole pass is CPU-flat AND shuffle-flat in the number
  * of feature streams.
  *
  * Running-frame semantics are exactly the k-`last` form's: rows arrive
  * in the window's sort order, a later non-null payload for slot i
  * overwrites an earlier one, so under the shared
  * (ts, tag, __p0..__p(k−1)) ordering duplicate (key, ts) stream rows
  * still resolve to the max payload struct (the last in order) and
  * `allowExact` keeps its tag trick. Slots never seen stay null, which
  * field-extracts to null payload columns — backward as-of's left-outer
  * contract.
  *
  * `merge`/`serialize` are unsupported by design: this function only
  * makes sense over a running window frame (per-partition sequential
  * update), never as a grouping aggregate with partial merge. Window
  * evaluation never calls either.
  */
case class MultiLastAsof(
    sid: Expression,
    payloads: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Any]] {

  override def children: Seq[Expression] = sid +: payloads
  override def nullable: Boolean = false
  override def prettyName: String = "multi_last_asof"

  /** Struct of the k running matches, one field per stream, positional
    * names `_0.._k-1` (callers extract `__m._i.field`).
    */
  override def dataType: DataType = StructType(payloads.zipWithIndex.map {
    case (p, i) => StructField(s"_$i", p.dataType, nullable = true)
  })

  override def createAggregationBuffer(): Array[Any] =
    new Array[Any](payloads.size)

  override def update(buf: Array[Any], input: InternalRow): Array[Any] = {
    val s = sid.eval(input)
    if (s != null) {
      val i = s.asInstanceOf[Int]
      val v = payloads(i).eval(input)
      // copy: the evaluated struct is a view into WindowExec's reused
      // input row buffer, which the next update would overwrite
      if (v != null) buf(i) = v.asInstanceOf[InternalRow].copy()
    }
    buf
  }

  override def eval(buf: Array[Any]): Any =
    // clone: the result row must not alias the still-mutating buffer
    // (WindowExec materializes each output row before the next update,
    // but eval's contract doesn't get to rely on that)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(buf.clone())

  override def merge(a: Array[Any], b: Array[Any]): Array[Any] =
    throw new UnsupportedOperationException(
      "multi_last_asof is a running window kernel; partial merge has no ordered meaning")

  override def serialize(buf: Array[Any]): Array[Byte] =
    throw new UnsupportedOperationException(
      "multi_last_asof is window-only; its buffer never crosses an exchange")

  override def deserialize(bytes: Array[Byte]): Array[Any] =
    throw new UnsupportedOperationException(
      "multi_last_asof is window-only; its buffer never crosses an exchange")

  override def withNewMutableAggBufferOffset(offset: Int): MultiLastAsof =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MultiLastAsof =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MultiLastAsof =
    copy(sid = newChildren.head, payloads = newChildren.tail)
}

object MultiLastAsof {

  /** Aggregate Column over (stream-id, k payload structs) — apply
    * `.over(window)` at the call site.
    */
  def columnFor(sid: Column, payloads: Seq[Column]): Column =
    ExpressionUtils.column(MultiLastAsof(
      ExpressionUtils.expression(sid),
      payloads.map(ExpressionUtils.expression)).toAggregateExpression())
}
