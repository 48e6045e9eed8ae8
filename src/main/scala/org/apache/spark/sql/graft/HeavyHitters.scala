package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a TypedImperativeAggregate — the
  * custom-buffer UDAF form (SURVEY.md §2.10): an arbitrary mutable
  * buffer with explicit serialize/merge, the shape needed for sketches
  * Spark lacks.
  *
  * Semantics: track up to `capacity` (item, count, error) entries; a new
  * item under pressure evicts the current minimum and inherits its count
  * as overestimation error. Guarantees: estimated count >= true count;
  * every item with true frequency > n/capacity is present. When the
  * number of distinct items never exceeds capacity the counts are EXACT
  * (errors all zero) — which is what lets the declared query hash-match
  * a plain GROUP BY count oracle.
  *
  * Merge follows the standard SpaceSaving union: sum matching entries
  * (counts and errors), offset absent ones by the other side's minimum
  * count as added error, re-truncate to capacity. At 100 TB this is a
  * fixed-size buffer per partition per group — the whole point versus an
  * exact groupBy on a high-cardinality column.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]]
  with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  /** item -> (count, error) */
  type Buf = mutable.HashMap[String, (Long, Long)]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType),
    StructField("err", LongType))))

  override def createAggregationBuffer(): Buf = mutable.HashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String].toString
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + 1, e))
      case None if buf.size < capacity => buf.update(item, (1L, 0L))
      case None =>
        val (minItem, (minC, _)) = buf.minBy(_._2._1)
        buf.remove(minItem)
        buf.update(item, (minC + 1, minC))
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (b.isEmpty) return a
    val minA = if (a.isEmpty) 0L else a.values.map(_._1).min
    val minB = b.values.map(_._1).min
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (a.keySet ++ b.keySet).foreach { k =>
      (a.get(k), b.get(k)) match {
        case (Some((ca, ea)), Some((cb, eb))) => merged(k) = (ca + cb, ea + eb)
        case (Some((ca, ea)), None) => merged(k) = (ca + minB, ea + minB)
        case (None, Some((cb, eb))) => merged(k) = (cb + minA, eb + minA)
        case _ =>
      }
    }
    if (merged.size <= capacity) merged
    else mutable.HashMap(merged.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
      .take(capacity): _*)
  }

  override def eval(buf: Buf): Any = {
    val rows = buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
      .map { case (k, (c, e)) =>
        InternalRow(UTF8String.fromString(k), c, e)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, (c, e)) =>
      out.writeUTF(k); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf: Buf = mutable.HashMap.empty
    (0 until n).foreach { _ =>
      val k = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf(k) = (c, e)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHitters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}

object HeavyHitters {
  def columnFor(c: Column, capacity: Int): Column =
    ExpressionUtils.column(
      HeavyHitters(ExpressionUtils.expression(c), capacity).toAggregateExpression())
}
