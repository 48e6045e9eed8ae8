// Lives under org.apache.spark.sql because ExpectsInputTypes.inputTypes
// returns the private[sql] AbstractDataType — the standard home for
// third-party Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for the exact scaled dot product:
  *
  *   sum_i  floor(a(i) * b(i) * 1e14)  as BIGINT
  *
  * Numerically identical to the HOF formulation in
  * [[VectorFunctions.dotScaledHof]] (same per-element op order), but
  * with `doGenCode`: one fused Java loop over the two array buffers, no
  * per-element lambda dispatch and no intermediate zipped array — the
  * reason a custom Expression beats HOFs beats UDFs on the similarity
  * hot path (~2× on the pairwise joins, measured in Bench).
  *
  * Null semantics match the HOF exactly: null if either array is null,
  * if lengths differ (zip_with would pad with null and poison the sum),
  * or if any element is null.
  */
case class VectorDotScaled(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot_scaled"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xa = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val xb = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += math.floor(xa * xb * 1.0e14).toLong
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (long) Math.floor(((double) $a.$lGet($i)) * ((double) $b.$rGet($i)) * 1.0E14D);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotScaled =
    copy(left = newLeft, right = newRight)
}

object VectorDotScaled {

  /** Column-level entry point (Expression -> Column bridging needs
    * package-private ExpressionUtils, hence it lives here).
    */
  def columnFor(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorDotScaled(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Registration triple for SQL exposure — used both by
    * [[graft.GraftExtensions]] (spark.sql.extensions) and for direct
    * FunctionRegistry registration in an existing session.
    */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot_scaled"),
    new ExpressionInfo(classOf[VectorDotScaled].getName, "vector_dot_scaled"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "vector_dot_scaled(a, b) takes exactly 2 arguments")
      VectorDotScaled(exprs.head, exprs(1))
    })
}
