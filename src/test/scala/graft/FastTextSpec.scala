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

  test("ngram_hash_set kernel equals array_sort(transform(ngram_set, xxhash64))") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
      .select(col("text"))
      .union(Seq("", "a b", "a b c", "a b c a b c", "x  y\tz w",
        "ONE Two three FOUR").toDF("text"))
    val both = docs.select(
      FastText.ngramHashSet(col("text"), 3).as("kernel"),
      array_sort(transform(FastText.ngramSet(col("text"), 3),
        x => xxhash64(x))).as("reference"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"kernel diverged from the HOF reference on: $r")
    }
    // null propagates null through the kernel like ngram_set
    val n = Seq[String](null).toDF("text")
      .select(FastText.ngramHashSet(col("text"), 3)).collect()
    assert(n.head.isNullAt(0))
  }

  test("bigram_counts kernel equals the explode+groupBy twin (code points, dups, unicode)") {
    import org.apache.spark.sql.graft.BigramCounts
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
      .select(lower(col("text")).as("t"))
      .union(Seq("", "a", "ab", "aaaa", "ab ab ab", "日本語のテキスト",
        "mixed 日本 text", "a😀b😀a😀b")
        .toDF("t"))
      .filter(length(col("t")) >= 2)
      .withColumn("doc", monotonically_increasing_id())
    val kernel = docs.select(col("doc"),
      explode(BigramCounts.columnFor(col("t"))).as("e"))
      .select(col("doc"), col("e.b").as("b"), col("e.k").as("k"))
    val reference = docs.select(col("doc"),
      explode(expr("transform(sequence(1, length(t) - 1), i -> substr(t, i, 2))")).as("b"))
      .groupBy("doc", "b").agg(count(lit(1)).as("k"))
    assert(kernel.exceptAll(reference).isEmpty &&
      reference.exceptAll(kernel).isEmpty,
      "bigram_counts diverged from the explode+groupBy reference")
    // null propagates; sub-bigram strings produce empty arrays
    import spark.implicits._
    val edge = Seq[String](null).toDF("t")
      .select(BigramCounts.columnFor(col("t"))).collect()
    assert(edge.head.isNullAt(0))
    val short = Seq("x").toDF("t")
      .select(size(BigramCounts.columnFor(col("t")))).collect()
    assert(short.head.getInt(0) == 0)
  }

  test("jaccard_hash_sets on sorted hashes equals jaccard on the strings") {
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("x y z", "y z w"), Seq("y z w", "z w v", "w v u")),
      (Seq("a"), Seq("a")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq("a")),
      (Seq.empty[String], Seq.empty[String]),
      (null, Seq("a")),
      (null, null))
    val df = cases.toDF("a", "b")
    def h(c: org.apache.spark.sql.Column) =
      array_sort(transform(c, x => xxhash64(x)))
    val got = df.select(FastText.jaccardHash(h(col("a")), h(col("b"))))
      .as[Double].collect()
    val want = df.select(FastText.jaccard(col("a"), col("b"))).as[Double].collect()
    // null transform input -> null array; the kernel treats null as empty
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

  test("rolling_fingerprint kernel equals the HOF formulation incl. short docs") {
    val df = edgeTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    for (k <- Seq(1, 2, 5)) {
      val rows = df.select(
        TextFunctions.rollingFingerprint(
          TextFunctions.tokens(col("text")), k).as("kern"),
        TextFunctions.rollingFingerprintHof(
          TextFunctions.tokens(col("text")), k).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getAs[Any]("kern") == r.getAs[Any]("hof"),
          s"k=$k kernel=${r.getAs[Any]("kern")} hof=${r.getAs[Any]("hof")}")
      }
    }
  }

  test("repetition_stats kernel equals the HOF formulation incl. edge cases") {
    // non-empty docs with >= 1 token: the HOF reference divides by zero
    // on empty docs, the kernel returns zeros — both unreachable for the
    // fixture corpus (min 10 tokens), pinned here only where they agree
    val texts = edgeTexts.filter(t => t != null && t.trim.nonEmpty) ++ Seq(
      "a a a a a",
      "a b a b a b",
      "unique tokens only here now",
      "x y x y x z z y x")
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val got = df.select(col("id"),
      TextFunctions.repetitionStats(col("text")).as("k"),
      TextFunctions.repetitionStatsHof(col("text")).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"id=${r.get(0)}: kernel ${r.getSeq[Long](1)} != hof ${r.getSeq[Long](2)}")
    }
    // null propagates
    val nullRow = Seq((0L, null: String)).toDF("id", "text")
      .select(TextFunctions.repetitionStats(col("text"))).head()
    assert(nullRow.isNullAt(0))
  }

  test("lang_marker_hits kernel equals the HOF formulation per language") {
    val texts = edgeTexts ++ Seq(
      "the cat is on the mat and the dog is in the house",
      "el gato y la casa de los que en una por con",
      "der hund ist nicht mit der katze und das haus",
      "le chat est dans la maison et les chiens que pour",
      "的是不我了在人有他这的是不我了在人有他这",   // unsegmented zh
      "的 是 不 我 了 在 人 有 他 这",               // segmented zh
      "THE The tHe the",                              // case folding
      "elde\fla")                               // exotic ASCII ws
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val langs = org.apache.spark.sql.graft.LangMarkerHits.Order
    val got = df.select(col("id") +:
      langs.map(l => TextFunctions.langHits(col("text"), l).as(s"k_$l")) ++:
      langs.map(l => TextFunctions.langHitsHof(col("text"), l).as(s"h_$l")): _*)
      .collect()
    got.foreach { r =>
      langs.foreach { l =>
        assert(r.getAs[Any](s"k_$l") == r.getAs[Any](s"h_$l"),
          s"lang $l disagrees for id ${r.getAs[Int]("id")}: " +
            s"kernel=${r.getAs[Any](s"k_$l")} hof=${r.getAs[Any](s"h_$l")}")
      }
    }
    // and the argmax over a materialized hits array equals langId-over-
    // HOF semantics end to end: known-language samples classify right
    val pred = df.select(col("id"),
        TextFunctions.langMarkerHits(col("text")).as("__h"))
      .select(col("id"), TextFunctions.langIdFromHits(col("__h")).as("p"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val n0 = edgeTexts.size
    assert(pred(n0) == "en" && pred(n0 + 1) == "es" && pred(n0 + 2) == "de" &&
      pred(n0 + 3) == "fr" && pred(n0 + 4) == "zh" && pred(n0 + 5) == "zh")
  }

  test("nfc_normalize: composes decomposed marks, identity on NFC/ASCII, null-propagating, idempotent") {
    val rows = Seq(
      "café",          // e + combining acute -> é
      "über",          // u + combining diaeresis -> ü
      "café",           // already composed: unchanged
      "plain ascii 123",     // ASCII fast path: unchanged
      "",                    // empty: unchanged
      null                   // null in, null out
    ).zipWithIndex.toDF("s", "i")
    val got = rows.select(col("i"), TextFunctions.nfcNormalize(col("s")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getAs[String]("n")).toMap
    assert(got(0) == "caf\u00e9" && got(1) == "\u00fcber")
    assert(got(2) == "caf\u00e9" && got(3) == "plain ascii 123" && got(4) == "")
    assert(got(5) == null)
    // idempotent: nfc(nfc(x)) == nfc(x)
    val twice = rows.select(col("i"),
        TextFunctions.nfcNormalize(TextFunctions.nfcNormalize(col("s"))).as("n"))
      .collect().map(r => r.getInt(0) -> r.getAs[String]("n")).toMap
    assert(twice == got)
  }
}
