package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native repetition-signal counter: ONE pass over the document text
  * yields `array<long>` [nTokens, nDistinct, topTokenCount, nBigrams,
  * nDistinctBigrams] — everything the Gopher-style repetition filters
  * (`text_repetition`) derive their fractions from.
  *
  * Semantics are identical to the HOF formulation over
  * `tokens(text)` (lowercased maximal non-whitespace runs; asserted in
  * FastTextSpec): distinctness and the top count use exact string
  * equality, bigrams are adjacent tokens joined by one space (tokens
  * contain no whitespace, so the join is collision-free).
  *
  * Why native: the HOF top-token count is
  * `transform(array_distinct(ws), w -> size(filter(ws, t -> t = w)))`
  * — O(vocab·len) interpreted lambda evaluation per document, plus two
  * more array_distinct materializations. The kernel's hash-map pass is
  * O(len) and stays inside whole-stage codegen.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.stats(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // bound-reference kernel: MODULE$ source-text references fail janino
    // and silently fall back to interpreted eval (same as SimHash64)
    val kernel = ctx.addReferenceObj("repStatsKernel", RepetitionStats,
      RepetitionStats.getClass.getName)
    nullSafeCodeGen(ctx, ev, text => s"${ev.value} = $kernel.stats($text);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private val Space = UTF8String.fromString(" ")

  /** One-pass counts over the lowered text; called from both the
    * interpreted eval and the generated code.
    */
  def stats(text: UTF8String): ArrayData = {
    val lowered = text.toLowerCase
    val b = lowered.getBytes
    val n = b.length
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    val bigrams = new java.util.HashSet[UTF8String]()
    var nTokens = 0L
    var nBigrams = 0L
    var top = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      val start = i
      while (i < n && !isWs(b(i))) i += 1
      if (i > start) {
        // copy the slice: UTF8String.fromBytes views would share `b`,
        // which is fine here, but an explicit copy keeps the map keys
        // self-contained and hashable after this frame returns
        val tok = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, i))
        nTokens += 1
        var c = counts.get(tok)
        if (c == null) { c = Array(0L); counts.put(tok, c) }
        c(0) += 1
        if (c(0) > top) top = c(0)
        if (prev != null) {
          nBigrams += 1
          bigrams.add(UTF8String.concat(prev, Space, tok))
        }
        prev = tok
      }
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array(nTokens, counts.size.toLong, top, nBigrams, bigrams.size.toLong))
  }

  def columnFor(text: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(text)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("repetition_stats"),
    new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "repetition_stats(text) takes exactly 1 argument")
      RepetitionStats(exprs.head)
    })
}
