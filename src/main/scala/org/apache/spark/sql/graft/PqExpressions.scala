package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Product-quantization kernels (SURVEY.md §2.9 ANN scale path).
  *
  * PQ splits a d-dim vector into `m` contiguous subvectors and replaces
  * each with the id of its nearest subspace centroid, so a corpus row
  * compresses from d floats to m small codes — the layout that lets a
  * 100 TB embedding corpus keep its searchable representation ~40×
  * smaller than the raw vectors (here m ints for clarity; the
  * pack-to-4-bit step is a storage detail, not a plan change). Scoring
  * never touches the raw vector: a probe precomputes per-subspace
  * lookup tables against the query once, and each corpus row is scored
  * by `m` table lookups ([[PqAdcScore]] — asymmetric distance
  * computation).
  *
  * Both kernels follow [[NearestCells]]' constant-reference discipline:
  * the codebook/LUT matrices are driver-side constants baked into the
  * expression (m·k ≤ a few hundred doubles), and the codegen'd path
  * calls the same row kernel as interpreted eval — these run once per
  * corpus row, so they must not be HOF chains or UDFs.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    PqEncode.kernel(input.asInstanceOf[ArrayData], codebooks, isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = ctx.addReferenceObj("pqEncodeKernel", PqEncode,
      PqEncode.getClass.getName)
    val books = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = $kernels.kernel($v, $books, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {

  /** Row kernel: per subspace, the id of the nearest (squared
    * euclidean, ties by id) centroid. Malformed rows (length ≠ m·subDim
    * or a null element) encode as all-zero codes — the same
    * deterministic poisoning convention as [[NearestCells]]: a garbage
    * row lands on a valid (worst-scoring-by-luck, never crashing) code
    * word instead of a partial distance.
    */
  def kernel(v: ArrayData, codebooks: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    def sentinel = UnsafeArrayData.fromPrimitiveArray(new Array[Int](m))
    if (v.numElements() != m * subDim) return sentinel
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      val base = s * subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          if (v.isNullAt(base + i)) return sentinel
          val x = if (isFloat) v.getFloat(base + i).toDouble else v.getDouble(base + i)
          val t = x - cent(i)
          acc += t * t
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  def columnFor(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(
      PqEncode(ExpressionUtils.expression(vec), codebooks))
}

/** Approximate cosine of (query, reconstructed corpus row) from PQ codes
  * alone: `Σ_s lutDot(s)(code_s) / (qNorm · sqrt(Σ_s lutSq(s)(code_s)))`
  * where `lutDot(s)(c) = dot(q_s, centroid_c)` and `lutSq(s)(c) =
  * |centroid_c|²` are precomputed once per probe. Malformed code rows
  * (wrong arity, out-of-range code) score -2.0 — below any true cosine,
  * so they deterministically sort last instead of poisoning the top-k.
  */
case class PqAdcScore(child: Expression, lutDot: Array[Array[Double]],
    lutSq: Array[Array[Double]], qNorm: Double)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(input: Any): Any =
    PqAdcScore.kernel(input.asInstanceOf[ArrayData], lutDot, lutSq, qNorm)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = ctx.addReferenceObj("pqAdcKernel", PqAdcScore,
      PqAdcScore.getClass.getName)
    val dots = ctx.addReferenceObj("lutDot", lutDot, "double[][]")
    val sqs = ctx.addReferenceObj("lutSq", lutSq, "double[][]")
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = $kernels.kernel($v, $dots, $sqs, $qNorm);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}

object PqAdcScore {

  def kernel(codes: ArrayData, lutDot: Array[Array[Double]],
      lutSq: Array[Array[Double]], qNorm: Double): Double = {
    val m = lutDot.length
    if (codes.numElements() != m) return -2.0
    var dot = 0.0
    var sq = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return -2.0
      val c = codes.getInt(s)
      if (c < 0 || c >= lutDot(s).length) return -2.0
      dot += lutDot(s)(c)
      sq += lutSq(s)(c)
      s += 1
    }
    val den = qNorm * math.sqrt(sq)
    if (den == 0.0) -2.0 else dot / den
  }

  def columnFor(codes: Column, lutDot: Array[Array[Double]],
      lutSq: Array[Array[Double]], qNorm: Double): Column =
    ExpressionUtils.column(
      PqAdcScore(ExpressionUtils.expression(codes), lutDot, lutSq, qNorm))
}
