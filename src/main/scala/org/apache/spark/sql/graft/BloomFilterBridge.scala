package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column bridge for Spark's internal bloom-filter expression pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the same
  * expressions `InjectRuntimeFilter` plants for runtime row-level
  * filtering). Lives in the sql package tree because the Column ↔
  * Expression bridge (`ExpressionUtils`) is private[sql]; the public
  * operator surface is [[graft.operators.BloomPrefilter]].
  */
object BloomFilterBridge {

  /** Aggregate Column building a bloom filter (binary) over `hashed`
    * (must be LongType — hash keys with xxhash64 first).
    */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Predicate Column: serialized filter might contain `hashed`. */
  def mightContain(bloom: Array[Byte], hashed: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ExpressionUtils.expression(hashed)))
}
