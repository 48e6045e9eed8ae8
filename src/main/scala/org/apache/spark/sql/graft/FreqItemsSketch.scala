package org.apache.spark.sql.graft

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Mergeable frequent-items (heavy hitters) sketch — DataSketches
  * `LongsSketch` (Misra-Gries family) as a TypedImperativeAggregate,
  * completing the mergeable-sketch trio (HLL distinct, KLL quantiles,
  * FI heavy hitters; SURVEY.md §2.4): fixed-size per-partition state
  * with map-side partial aggregation, sketch BYTES as output so
  * downstream rollups union ~group-count sketches instead of
  * rescanning rows. `agg_heavy_hitters` is the exact two-pass
  * counterpart; this is the one-pass / streaming / incremental path —
  * at 100 TB the exact pass re-shuffles the corpus per refresh while
  * the sketches just re-union.
  *
  * Guarantee (maxMapSize m): every estimate's [lower, upper] bound
  * contains the true count, and the error is at most ~3.5·n/m, so with
  * NO_FALSE_NEGATIVES every item with true count above the error bound
  * is returned. SketchSpec pins both properties against exact counts.
  */
case class FreqAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_agg"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: LongsSketch, b: LongsSketch): LongsSketch = {
    a.merge(b); a
  }

  override def eval(buf: LongsSketch): Any = buf.toByteArray

  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): FreqAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqAgg =
    copy(child = newChildren.head)
}

/** Union of serialized frequent-items sketches — the rollup half. */
case class FreqUnionAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_union_agg"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val ev = child.eval(input)
    if (ev != null)
      buf.merge(LongsSketch.getInstance(Memory.wrap(ev.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(a: LongsSketch, b: LongsSketch): LongsSketch = {
    a.merge(b); a
  }

  override def eval(buf: LongsSketch): Any = buf.toByteArray

  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqUnionAgg =
    copy(child = newChildren.head)
}

/** Scalar: the top-k frequent items from serialized sketch bytes as
  * array<struct<item, est, lb, ub>>, NO_FALSE_NEGATIVES order (by
  * estimate desc, item asc tiebreak for determinism given one sketch).
  * CodegenFallback is deliberate: evaluates once per GROUP over sketch
  * bytes, never per source row.
  */
case class FreqTopK(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "freq_top_k"

  override def nullSafeEval(input: Any): Any = {
    val sk = LongsSketch.getInstance(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem)).take(k)
      .map { r =>
        new GenericInternalRow(Array[Any](r.getItem, r.getEstimate,
          r.getLowerBound, r.getUpperBound))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): FreqTopK =
    copy(child = newChild)
}

object FreqItemsSketch {
  def agg(c: Column, maxMapSize: Int = 64): Column =
    ExpressionUtils.column(
      FreqAgg(ExpressionUtils.expression(c), maxMapSize).toAggregateExpression())

  def unionAgg(c: Column, maxMapSize: Int = 64): Column =
    ExpressionUtils.column(
      FreqUnionAgg(ExpressionUtils.expression(c), maxMapSize).toAggregateExpression())

  def topK(c: Column, k: Int): Column =
    ExpressionUtils.column(FreqTopK(ExpressionUtils.expression(c), k))
}
