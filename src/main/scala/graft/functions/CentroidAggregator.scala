package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF (the Dask `Aggregation(chunk, agg, finalize)`
  * equivalent — SURVEY.md §2.10): elementwise centroid of an embedding
  * column.
  *
  * chunk/agg/finalize map exactly onto Aggregator's reduce/merge/finish,
  * which Spark executes as partial aggregation before the shuffle and
  * final aggregation after — one shuffle of (groups × buffer) rows, not
  * data rows.
  *
  * Determinism: elements are accumulated as floor(x * 1e9) scaled longs,
  * so partial/merge order cannot perturb low bits and the result is
  * hash-stable against the DuckDB oracle (SURVEY.md §4.2).
  */
class CentroidAggregator(dim: Int)
    extends Aggregator[Array[Float], (Array[Long], Long), Array[Double]] {

  private val Scale = 1e9

  override def zero: (Array[Long], Long) = (Array.fill(dim)(0L), 0L)

  override def reduce(b: (Array[Long], Long), v: Array[Float]): (Array[Long], Long) = {
    val (sums, n) = b
    var i = 0
    while (i < dim && i < v.length) {
      sums(i) += math.floor(v(i).toDouble * Scale).toLong
      i += 1
    }
    (sums, n + 1)
  }

  override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    val out = new Array[Long](dim)
    var i = 0
    while (i < dim) { out(i) = a._1(i) + b._1(i); i += 1 }
    (out, a._2 + b._2)
  }

  override def finish(r: (Array[Long], Long)): Array[Double] =
    if (r._2 == 0) Array.empty
    else r._1.map(s => s.toDouble / Scale / r._2.toDouble)

  override def bufferEncoder: Encoder[(Array[Long], Long)] = CentroidAggregator.bufEnc

  override def outputEncoder: Encoder[Array[Double]] = CentroidAggregator.outEnc
}

object CentroidAggregator {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private val bufEnc: Encoder[(Array[Long], Long)] = ExpressionEncoder[(Array[Long], Long)]()
  private val outEnc: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
