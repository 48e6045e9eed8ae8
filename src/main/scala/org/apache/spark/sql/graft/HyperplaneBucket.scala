package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket id of an embedding (SURVEY.md §2.9 ANN
  * scale path): bit p of the result
  * is the sign of the dot product with the p-th of `nPlanes` fixed
  * Gaussian hyperplanes (deterministic from `seed`).
  *
  * Replaces the HOF formulation (per-plane `aggregate(zip_with(...))`
  * chain), which evaluated INTERPRETED at O(nPlanes·dim) lambda
  * dispatches per row — the dominant per-row cost of an LSH index build
  * over a 100 TB corpus. The codegen'd loop reads the array buffer
  * directly against a constant plane matrix. Fold order and arithmetic
  * match the HOF exactly (left-to-right double accumulation, strict
  * `> 0` sign), asserted in HyperplaneBucketSpec.
  */
case class HyperplaneBucket(child: Expression, nPlanes: Int, dim: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  // bucket ids are ints and the probe masks are `1 << p`: beyond 31
  // planes the shift wraps and distinct planes silently collide
  require(nPlanes >= 1 && nPlanes <= 31,
    s"nPlanes must be in [1, 31], got $nPlanes")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  @transient private lazy val planes: Array[Array[Double]] =
    HyperplaneBucket.planes(nPlanes, dim, seed)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // HOF parity on malformed rows: zip_with null-pads a length
    // mismatch and a null element poisons the whole sum, so every
    // plane's `when(null > 0)` was false — bucket 0. Reproduce that
    // exactly instead of computing a partial dot product.
    if (v.numElements() != dim) return 0
    val f = isFloat
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      val row = planes(p)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return 0
        acc += (if (f) v.getFloat(i).toDouble else v.getDouble(i)) * row(i)
        i += 1
      }
      if (acc > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("hyperplanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val bucket = ctx.freshName("bucket")
      val bad = ctx.freshName("malformed")
      s"""
         |int $bucket = 0;
         |boolean $bad = $v.numElements() != $dim;
         |for (int $p = 0; !$bad && $p < $nPlanes; $p++) {
         |  final double[] $row = $planesRef[$p];
         |  double $acc = 0.0D;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { $bad = true; break; }
         |    $acc += ((double) $v.$get($i)) * $row[$i];
         |  }
         |  if (!$bad && $acc > 0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bad ? 0 : $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {

  /** Deterministic pseudo-random Gaussian hyperplanes (unit-free; only
    * the sign of the projection matters).
    */
  def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  def columnFor(vec: Column, nPlanes: Int, dim: Int, seed: Long): Column =
    ExpressionUtils.column(
      HyperplaneBucket(ExpressionUtils.expression(vec), nPlanes, dim, seed))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_bucket"),
    new ExpressionInfo(classOf[HyperplaneBucket].getName, "hyperplane_bucket"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 4 && exprs.drop(1).forall(_.foldable),
        "hyperplane_bucket(vec, nPlanes, dim, seed) takes literal params")
      HyperplaneBucket(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].longValue())
    })
}
