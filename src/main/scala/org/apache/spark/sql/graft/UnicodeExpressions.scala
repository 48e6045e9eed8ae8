package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel — a cleaning-pipeline primitive
  * (SURVEY.md §2.9): web-crawled corpora mix composed ("é") and
  * decomposed ("e"+U+0301) forms of the same text, which breaks exact
  * dedup, n-gram matching, and tokenizer vocab lookups unless every
  * document is canonicalized once at ingest. JDK `java.text.Normalizer`
  * implements Unicode NFC with zero extra dependencies.
  */
object UnicodeKernels extends Serializable {
  /** NFC-normalize. Two fast paths for the dominant already-normal
    * cases: an all-ASCII byte scan (ASCII is NFC by definition) returns
    * the input with ZERO allocation — no UTF-16 decode at all; non-ASCII
    * rows pay one `toString` for `isNormalized` (a check scan, no
    * normalize buffer) and still return the original UTF8String when
    * already composed. Only genuinely decomposed rows allocate a
    * normalized copy.
    */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n && (s.getByte(i) & 0x80) == 0) i += 1
    if (i == n) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Codegen `nfc_normalize(text)` — stays inside whole-stage codegen
  * (one static-object call per row; no UDF SerDe).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("unicodeKernels", UnicodeKernels,
      UnicodeKernels.getClass.getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $k.nfc($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def columnFor(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "nfc_normalize(text) takes one string")
      NfcNormalize(exprs.head)
    })
}
