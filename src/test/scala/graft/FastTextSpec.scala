package graft

import org.apache.spark.sql.functions._
import graft.functions.FastText
import graft.functions.TextFunctions

/** The imperative FastText kernels must be drop-in equivalents of the
  * expression pipelines they replaced on the dedup hot path — pinned
  * here on the edge cases the sf fixtures don't contain (null text,
  * whitespace soup, unicode, fewer-than-n tokens).
  */
class FastTextSpec extends SparkSpec {
  import spark.implicits._

  private val edgeTexts: Seq[String] = Seq(
    null,
    "",
    "   ",
    "one",
    "one two",
    "one two three",
    "  leading and trailing   spaces\tand\ttabs\nand newlines  ",
    "Repeat repeat repeat repeat repeat words words words",
    "MIXED Case TOKENS mixed case tokens",
    "café naïve résumé café naïve résumé extra",
    "的是不 我们 在这里 的是不 我们 tail tail tail")

  test("ngramSet equals array_distinct(wordNgrams(tokens)) on edge cases") {
    val df = edgeTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    val rows = df.select(
      FastText.ngramSet(col("text"), 3).as("kernel"),
      array_distinct(TextFunctions.wordNgrams(
        TextFunctions.tokens(col("text")), 3)).as("expr"))
      .as[(Seq[String], Seq[String])].collect()
    rows.zip(edgeTexts).foreach { case ((kernel, expr), text) =>
      // null text: the expression pipeline yields null, the kernel an
      // empty array — both fall out of the size(grams) > 0 filter every
      // caller applies, so empty==null here
      assert(Option(kernel).getOrElse(Seq.empty) == Option(expr).getOrElse(Seq.empty),
        s"mismatch for text=${Option(text).map(t => s"'$t'").getOrElse("null")}")
    }
  }

  test("ngramSet keeps first-occurrence order and drops short documents") {
    val got = Seq("b c d a b c d x y").toDF("text")
      .select(FastText.ngramSet(col("text"), 3)).as[Seq[String]].head()
    assert(got == Seq("b c d", "c d a", "d a b", "a b c", "c d x", "d x y"))
    val short = Seq("only two").toDF("text")
      .select(FastText.ngramSet(col("text"), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("jaccard kernel matches the set-algebra definition incl. empty/null") {
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),   // 2/4
      (Seq("a"), Seq("a")),                       // 1/1
      (Seq("a"), Seq("b")),                       // 0/2
      (Seq.empty[String], Seq("a")),              // 0/1
      (Seq.empty[String], Seq.empty[String]),     // defined as 0
      (null, Seq("a")),                           // null -> empty
      (null, null))
    val df = cases.toDF("a", "b")
    val got = df.select(FastText.jaccard(col("a"), col("b"))).as[Double].collect()
    val want = cases.map { case (a0, b0) =>
      val a = Option(a0).getOrElse(Seq.empty).toSet
      val b = Option(b0).getOrElse(Seq.empty).toSet
      if (a.isEmpty && b.isEmpty) 0.0
      else (a intersect b).size.toDouble / (a union b).size.toDouble
    }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("null input propagates null through ngram_set and lsh_band_buckets") {
    // pinned DIVERGENCE from the round-3 UDFs (which returned an empty
    // array / a full signature on null): the codegen expressions follow
    // Catalyst's null-safe contract. Pipelines are unaffected (every
    // caller filters size(grams) > 0), but SQL users of the registered
    // functions see null-in/null-out — this test keeps that contract
    // from drifting unnoticed.
    val got = Seq(null: String).toDF("text")
      .select(FastText.ngramSet(col("text"), 3).as("grams"))
      .select(FastText.lshBandBuckets(col("grams"), 8, 4).as("buckets"), col("grams"))
      .select(isnull(col("grams")), isnull(col("buckets")))
      .as[(Boolean, Boolean)].head()
    assert(got == ((true, true)), s"expected null-in/null-out, got $got")
  }

  test("lshBandBuckets: deterministic, bands-sized, identical texts collide") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog").toDF("text")
      .select(FastText.ngramSet(col("text"), 3).as("grams"))
      .select(FastText.lshBandBuckets(col("grams"), 8, 4).as("buckets"))
    val rows = df.as[Seq[Long]].collect()
    assert(rows.forall(_.length == 8))
    assert(rows(0) == rows(1), "identical gram sets must land in identical buckets")
  }
}
