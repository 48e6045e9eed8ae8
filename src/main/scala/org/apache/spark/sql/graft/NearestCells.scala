package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Cell ids of the `n` centroids nearest a vector (SURVEY.md §2.9 ANN
  * IVF path), ascending squared
  * euclidean distance, ties broken by cell id — the IVF assign/probe
  * kernel.
  *
  * The centroid matrix is a driver-side constant baked into the
  * expression (an index has at most a few dozen cells; a literal-array
  * HOF chain over it cost ~2.5 s of Catalyst analysis per plan,
  * measured in round 2, and a Scala UDF paid converters per row). The
  * codegen'd loop reads the array buffer directly — the build-side
  * assignment evaluates this once per corpus row, so it is the one
  * expression in the IVF path that must not be interpreted.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    NearestCells.kernel(input.asInstanceOf[ArrayData], centroids, n, isFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernels = ctx.addReferenceObj("nearestCellsKernel", NearestCells,
      NearestCells.getClass.getName)
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev,
      v => s"${ev.value} = $kernels.kernel($v, $cents, $n, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {

  /** Row kernel (shared by interpreted eval and codegen): distances to
    * every centroid, then an insertion-ranked selection of the n
    * smallest (centroid counts are tiny — at most a few dozen).
    *
    * Malformed rows (length mismatch vs the centroid dim, or a null
    * element) get the same sentinel convention as
    * [[HyperplaneBucket]]'s bucket-0 poisoning: cells `[0, 1, ...)` in
    * id order — deterministic, and a malformed query still meets a
    * malformed corpus row in cell 0 rather than computing a garbage
    * partial distance.
    */
  def kernel(v: ArrayData, centroids: Array[Array[Double]], n: Int,
      isFloat: Boolean): ArrayData = {
    val k = centroids.length
    val take = math.min(n, k)
    if (take == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Int])
    def sentinel = UnsafeArrayData.fromPrimitiveArray(Array.tabulate(take)(identity))
    val dim = centroids(0).length
    if (v.numElements() != dim) return sentinel
    val d = new Array[Double](k)
    var c = 0
    while (c < k) {
      val row = centroids(c)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return sentinel
        val t = (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) - row(i)
        acc += t * t
        i += 1
      }
      d(c) = acc
      c += 1
    }
    val order = Array.tabulate(k)(identity)
    // insertion sort by (distance, id) — stable total order, k tiny
    var i = 1
    while (i < k) {
      val id = order(i)
      var j = i - 1
      while (j >= 0 && (d(order(j)) > d(id) || (d(order(j)) == d(id) && order(j) > id))) {
        order(j + 1) = order(j)
        j -= 1
      }
      order(j + 1) = id
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(order, take))
  }

  def columnFor(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    ExpressionUtils.column(
      NearestCells(ExpressionUtils.expression(vec), centroids, n))
}
