package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketch (DataSketches) as a
  * TypedImperativeAggregate — the quantile sibling of the HLL distinct
  * sketch (SURVEY.md §2.4 mergeable sketches): fixed-size per-partition
  * state with map-side partial aggregation, and sketch BYTES as the
  * output so downstream rollups re-aggregate ~group-count sketches
  * instead of rescanning the corpus — the only exact-free way to get
  * percentiles over 100 TB incrementally (exact path:
  * [[graft.operators.ExactQuantiles]]).
  *
  * KLL guarantees a normalized RANK error ε(k) (k=200 → ~1.65%
  * two-sided): the returned quantile's true rank is within ε of the
  * requested rank. SketchSpec pins that bound against exact quantiles
  * and merge-of-parts ≡ whole-stream estimates.
  */
case class KllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): KllAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllAgg =
    copy(child = newChildren.head)
}

/** Union of serialized KLL sketches — the rollup half: re-aggregate a
  * handful of per-group sketch bytes without touching the source rows.
  */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_union_agg"
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllUnionAgg =
    copy(child = newChildren.head)
}

/** Scalar: quantile estimates (INCLUSIVE search criteria) at fixed
  * ranks from serialized KLL sketch bytes. An empty sketch yields null.
  * CodegenFallback is deliberate: this evaluates once per GROUP over
  * ~1 KB sketch bytes (post-aggregation), never per source row, so
  * interpreted eval costs nothing and keeps the sketch library call
  * out of generated code.
  */
case class KllQuantiles(child: Expression, ranks: Array[Double])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

  override def nullSafeEval(input: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else new GenericArrayData(
      ranks.map(r => sk.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)))
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}

object KllQuantileSketch {
  def agg(c: Column, k: Int = 200): Column =
    ExpressionUtils.column(
      KllAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  def unionAgg(c: Column, k: Int = 200): Column =
    ExpressionUtils.column(
      KllUnionAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  def quantiles(c: Column, ranks: Seq[Double]): Column =
    ExpressionUtils.column(
      KllQuantiles(ExpressionUtils.expression(c), ranks.toArray))
}
