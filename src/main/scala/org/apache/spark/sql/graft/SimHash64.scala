package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 61-bit SimHash over a token array (bits 61..63 left clear so
  * the signature stays a positive BIGINT everywhere).
  *
  * Semantics are identical to the HOF formulation in
  * `graft.functions.TextFunctions.simHashHof` (same xxhash64 seed 42 via
  * XxHash64Function, same majority vote, null tokens skipped) — asserted
  * in SimHashSpec. The codegen'd loop replaces a doubly-nested HOF
  * (per-token 61-element zip_with) that dominated the simhash dedup
  * query's CPU profile; tokens hash once and votes live in a local
  * array.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private val Bits = 61

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < Bits) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the hasher goes in as a bound reference, NOT as a
    // `XxHash64Function.MODULE$` source-text class reference — MODULE$
    // lives on the XxHash64Function$ class, so the source-text form
    // failed janino compilation and silently fell back to interpreted
    // eval (visible as "Expr codegen error" warnings)
    val hashFn = ctx.addReferenceObj("xxhash64Fn", XxHash64Function,
      XxHash64Function.getClass.getName)
    val stringType = ctx.addReferenceObj("stringType", StringType)
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |final int[] $votes = new int[$Bits];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $h = $hashFn.hash($arr.getUTF8String($i), $stringType, 42L);
         |    for (int $b = 0; $b < $Bits; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $Bits; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def columnFor(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "simhash64(tokens) takes exactly 1 argument")
      SimHash64(exprs.head)
    })
}
