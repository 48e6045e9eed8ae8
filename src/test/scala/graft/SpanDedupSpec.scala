package graft

import org.apache.spark.sql.Row
import graft.operators.SpanDedup

/** Hand-computed corpus for the duplicate-span remover: keep-first
  * ordering, overlapping-interval merge, intra-doc repetition, the
  * fully-duplicated doc (empty survivor), and the below-width doc that
  * can never match.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b c d e"),         // first owner of "a b c"/"b c d"/"c d e"
    (2L, "x a b c d y"),       // re-uses doc 1's "a b c","b c d" -> loses tokens 1..4
    (3L, "p q r s p q r s"),   // self-repeat: tail 4 tokens duplicate its own head
    (4L, "a b c d e"),         // exact copy of doc 1 -> fully removed
    (5L, "z z")                // shorter than the window: untouchable
  ).toDF("doc_id", "text")

  test("keep-first span removal with overlap merge (w=3)") {
    val got = SpanDedup.removeDuplicateSpans(corpus, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    assert(got === Seq(
      Row(1L, 5L, 0L, "a b c d e"),
      Row(2L, 6L, 4L, "x y"),
      Row(3L, 8L, 4L, "p q r s"),
      Row(4L, 5L, 5L, ""),
      Row(5L, 2L, 0L, "z z")))
  }

  test("packed-key contract violations fail loudly (negative id)") {
    val bad = Seq((-1L, "a b c d")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      SpanDedup.removeDuplicateSpans(bad, "doc_id", "text", 3).collect()
    }
    assert(e.getMessage.contains("packed-key contract"))
  }

  test("fingerprint-keyed mode reproduces the string-keyed removal exactly") {
    // same corpus, both key regimes: the plan differs only in the key
    // column shipped into the stats aggregate and mark join, so the
    // removal set — and therefore every output cell — must be identical
    val s = SpanDedup.removeDuplicateSpans(corpus, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    val f = SpanDedup.removeDuplicateSpans(corpus, "doc_id", "text", 3,
      fingerprintGrams = true).orderBy("doc_id").collect().toSeq
    assert(f === s)
  }

  test("duplicate-free corpus is untouched at any width") {
    val clean = Seq((1L, "one two three four"), (2L, "five six seven eight"))
      .toDF("doc_id", "text")
    val got = SpanDedup.removeDuplicateSpans(clean, "doc_id", "text", 2)
      .orderBy("doc_id").collect().toSeq
    assert(got === Seq(
      Row(1L, 4L, 0L, "one two three four"),
      Row(2L, 4L, 0L, "five six seven eight")))
  }

  test("a long duplicated run costs overlapping marks, removed once each") {
    // doc 2 repeats doc 1's entire 6-token run: 4 overlapping w=3 spans
    // must merge into ONE removed region of 6 tokens, not 12
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val got = SpanDedup.removeDuplicateSpans(df, "doc_id", "text", 3)
      .orderBy("doc_id").collect().toSeq
    assert(got === Seq(
      Row(1L, 6L, 0L, "a b c d e f"),
      Row(2L, 6L, 6L, "")))
  }
}
