package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native language-marker hit counter: ONE pass over the document text
  * produces the marker-hit counts for every language in
  * [[LangMarkerHits.Order]] as an `array<int>` (en, es, de, fr, zh).
  *
  * Semantics are bit-identical to the HOF formulation
  * (`graft.functions.TextFunctions.langHitsHof`, asserted in
  * FastTextSpec): space-delimited languages count whole-token matches
  * over lowercased `\s+` tokens; zh counts marker occurrences as
  * substrings of the lowered raw text (real Chinese is unsegmented).
  *
  * Why native: `langId` is an argmax CASE chain, and phrased over HOFs
  * each arm re-evaluates per-language `filter(tokens, contains)`
  * subtrees; the combined tree is large enough to fall out of
  * whole-stage codegen, where interpreted HOF evaluation with no
  * common-subexpression elimination measured ~1.1 ms/doc (5.7 s for the
  * sf0.1 corpus — the most expensive thing in the cleaning pipeline).
  * The kernel tokenizes the UTF-8 bytes once (ASCII `\s`, matching
  * Java's regex `\s` on UTF-8 input) and compares token slices against
  * the marker byte patterns: ~30 µs/doc, and the CASE chain above it
  * duplicates only cheap `element_at` reads of one array.
  */
case class LangMarkerHits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lang_marker_hits"

  override def nullSafeEval(input: Any): Any =
    LangMarkerHits.hits(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // kernel goes in as a bound reference (same janino constraint as
    // SimHash64: MODULE$ source-text references fail to compile and
    // silently fall back to interpreted eval)
    val kernel = ctx.addReferenceObj("langHitsKernel", LangMarkerHits,
      LangMarkerHits.getClass.getName)
    nullSafeCodeGen(ctx, ev, text => s"${ev.value} = $kernel.hits($text);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangMarkerHits =
    copy(child = newChild)
}

object LangMarkerHits {

  /** Output order of the hits array — the langId preference order. */
  val Order: Seq[String] = Seq("en", "es", "de", "fr", "zh")

  // marker byte patterns, read from the single source of truth in
  // TextFunctions (safe: that object's initializer touches no
  // expression classes, so there is no init cycle)
  private lazy val markers: Map[String, Seq[Array[Byte]]] =
    graft.functions.TextFunctions.LangMarkers.map { case (l, ms) =>
      l -> ms.map(m => UTF8String.fromString(m).getBytes)
    }
  private lazy val tokenLangs: Array[Array[Array[Byte]]] =
    Order.filterNot(_ == "zh").map(l => markers(l).toArray).toArray
  private lazy val zhPatterns: Array[Array[Byte]] = markers("zh").toArray

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def slicesEqual(b: Array[Byte], start: Int, len: Int,
      m: Array[Byte]): Boolean = {
    if (m.length != len) return false
    var i = 0
    while (i < len) {
      if (b(start + i) != m(i)) return false
      i += 1
    }
    true
  }

  /** One-pass hit counts over the lowered text; called from both the
    * interpreted eval and the generated code.
    */
  def hits(text: UTF8String): ArrayData = {
    val b = text.toLowerCase.getBytes
    val counts = new Array[Int](Order.length)
    // whole-token matches for the space-delimited languages: walk
    // maximal non-whitespace runs (equivalent to split('\s+') + drop
    // empties; multi-byte UTF-8 units never collide with ASCII ws)
    var i = 0
    val n = b.length
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      val start = i
      while (i < n && !isWs(b(i))) i += 1
      val len = i - start
      if (len > 0) {
        var l = 0
        while (l < tokenLangs.length) {
          val ms = tokenLangs(l)
          var k = 0
          var done = false
          while (k < ms.length && !done) {
            if (slicesEqual(b, start, len, ms(k))) {
              counts(l) += 1
              done = true // a token equals at most one marker
            }
            k += 1
          }
          l += 1
        }
      }
    }
    // zh: substring occurrence counts over the whole lowered text
    // (markers are single chars, so non-overlapping == all occurrences,
    // matching the replace-length-delta oracle formulation)
    val zhIdx = Order.length - 1
    var p = 0
    while (p < n) {
      var k = 0
      var matched = 0
      while (k < zhPatterns.length && matched == 0) {
        val m = zhPatterns(k)
        if (p + m.length <= n && slicesEqual(b, p, m.length, m)) matched = m.length
        k += 1
      }
      if (matched > 0) { counts(zhIdx) += 1; p += matched }
      else p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  def columnFor(text: Column): Column =
    ExpressionUtils.column(LangMarkerHits(ExpressionUtils.expression(text)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lang_marker_hits"),
    new ExpressionInfo(classOf[LangMarkerHits].getName, "lang_marker_hits"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "lang_marker_hits(text) takes exactly 1 argument")
      LangMarkerHits(exprs.head)
    })
}
