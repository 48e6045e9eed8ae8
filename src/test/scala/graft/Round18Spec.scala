package graft

import org.apache.spark.sql.functions._

/** Driver-side replicas for the round-18 BPE work: the rank-order
  * replace chain (the declared oracle semantics,
  * [[graft.functions.Bpe.encode]] re-expressed over java.lang.String —
  * `String.replace` is the same non-overlapping left-to-right scan as
  * the engines' `replace`), and a deterministic BPE TRAINER so specs
  * and Stress can manufacture well-formed merge tables of any size
  * without shipping one.
  */
object BpeTools {

  /** The chain encode, exactly [[graft.functions.Bpe.encode]]'s
    * operation list: space-delimit, then each merge in rank order as a
    * non-overlapping left-to-right replace run TWICE.
    */
  private def cpSplit(word: String): Vector[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toVector

  def chainEncode(word: String, merges: Seq[(String, String)]): String = {
    var s = " " + cpSplit(word).map(_ + " ").mkString
    merges.foreach { case (l, r) =>
      val pat = s" $l $r "; val rep = s" $l$r "
      s = s.replace(pat, rep).replace(pat, rep)
    }
    s
  }

  def chainCount(word: String, merges: Seq[(String, String)]): Int = {
    val e = chainEncode(word, merges)
    e.count(_ == ' ') - 1
  }

  /** The classical lowest-rank-present loop over an ARBITRARY table —
    * [[BpeReference.classicalBpeCount]] generalized (and returning the
    * encoded string): the semantics the kernel must equal on EVERY
    * well-formed table, self-pairs included.
    */
  def classicalEncode(word: String, merges: Seq[(String, String)]): String = {
    val rank = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    var toks = cpSplit(word)
    var done = toks.length <= 1
    while (!done) {
      toks.indices.dropRight(1)
        .flatMap(i => rank.get((toks(i), toks(i + 1)))).minOption match {
        case None => done = true
        case Some(best) =>
          val (l, r) = merges(best)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
              out += l + r; i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.result()
          done = toks.length <= 1
      }
    }
    if (toks.isEmpty) " " else toks.mkString(" ", " ", " ")
  }

  /** A deterministic corpus big enough to train ≥1k merges from: every
    * 4-letter word over the 9-char merge alphabet plus seeded random
    * [a-z] words of length 5–12 (realistic merge depth).
    */
  def syntheticWords(nRandom: Int, seed: Long = 18L): Seq[String] = {
    val alpha = Seq("a", "n", "t", "h", "e", "s", "i", "o", "r")
    val quads = for (a <- alpha; b <- alpha; c <- alpha; d <- alpha)
      yield a + b + c + d
    val rnd = new scala.util.Random(seed)
    val randoms = (0 until nRandom).map { _ =>
      val len = 5 + rnd.nextInt(8)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    (quads ++ randoms).distinct
  }
}

/** Round-18 additions: the single-pass priority-merge BPE kernel
  * (r17 verdict #1 — encode cost independent of |merges|, external
  * merge-table load/validate), pinned equal to the declared replace
  * chain on the shipped 24-merge table AND on a trained ≥1k-merge
  * vocabulary; the external vocab load/save/validate surface.
  */
class Round18Spec extends SparkSpec {
  import spark.implicits._
  import graft.functions.Bpe

  private def kernelEncode(words: Seq[String],
      merges: Seq[(String, String)]): Map[String, String] =
    words.toDF("w")
      .withColumn("e", Bpe.encodeFast(col("w"), merges))
      .as[(String, String)].collect().toMap

  test("priority-merge kernel ≡ replace chain on the shipped 24-merge table") {
    val fixtureWords = graft.tables.Tables(spark, sf).documents
      .select(explode(split(regexp_replace(lower(col("text")), "[^a-z]+", " "), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String].collect().toSeq
    val words = (fixtureWords ++ BpeTools.syntheticWords(500) ++
      Seq("ananananan", "thththth", "aaaa", "x", "")).distinct
    assert(words.length > 6000, s"vocabulary too small: ${words.length}")
    // ENCODE equality (stronger than counts): the kernel's output string
    // is the chain's, so the shared delimiter arithmetic is identical too
    val got = kernelEncode(words, Bpe.Merges)
    words.foreach { w =>
      assert(got(w) == BpeTools.chainEncode(w, Bpe.Merges),
        s"word '$w': kernel '${got(w)}' vs chain")
    }
    // and the declared Column twins agree end-to-end
    val both = words.filter(_.nonEmpty).toDF("w")
      .select(col("w"), Bpe.tokenCount(col("w")).as("chain"),
        Bpe.tokenCountFast(col("w")).as("kernel"))
      .filter(col("chain") =!= col("kernel"))
    assert(both.isEmpty, s"disagreeing words: ${both.collect().mkString}")
  }

  test("kernel ≡ chain on a TRAINED ≥1k-merge vocabulary, loaded from an external file") {
    val corpus = BpeTools.syntheticWords(3000)
    val trained = Bpe.trainVocab(corpus.map((_, 1L)), 1200)
    assert(trained.length >= 1000, s"trainer exhausted at ${trained.length}")
    // trained tables are well-formed by construction — validate agrees
    Bpe.validateWellFormed(trained)
    // external-file roundtrip: the load path real deployments use
    val path = java.nio.file.Files.createTempDirectory("graft_bpe").toString + "/merges.txt"
    Bpe.saveVocab(spark, path, trained)
    val loaded = Bpe.loadVocab(spark, path)
    assert(loaded == trained)
    // kernel ≡ the CLASSICAL loop on the full trained table (self-pairs
    // included if training emitted any), and ≡ the replace chain on the
    // self-pair-free prefix (the only tables the chain can phrase —
    // r18 review #1)
    val words = (corpus ++ Seq("zzzzq", "expurgate", "")).distinct
    val got = kernelEncode(words, loaded)
    words.foreach { w =>
      assert(got(w) == BpeTools.classicalEncode(w, loaded), s"word '$w'")
    }
    // the training corpus puts a self-pair at rank ~20, so a prefix is
    // too shallow for a chain A/B — train a chain-expressible table
    // (allowSelfPairs = false) of the same depth instead
    val chainSafe = Bpe.trainVocab(corpus.map((_, 1L)), 1200,
      allowSelfPairs = false)
    assert(chainSafe.length >= 1000 &&
      chainSafe.forall { case (l, r) => l != r })
    Bpe.validateWellFormed(chainSafe)
    val gotSafe = kernelEncode(words, chainSafe)
    words.foreach { w =>
      assert(gotSafe(w) == BpeTools.chainEncode(w, chainSafe), s"word '$w'")
    }
    // the deep table genuinely bites: some word collapses to ONE token
    assert(words.exists(w => w.length > 3 && got(w).count(_ == ' ') == 2),
      "no word collapsed to a single token — table too shallow to trust")
  }

  test("self-pairs: kernel merges classically, the replace chain refuses (r18 review #1)") {
    // the divergence geometry: (a,a) on runs — chain would pair
    // (1,2)(4,5) where classical pairs (1,2)(3,4); counts split at run 6
    val table = Seq(("a", "a"), ("aa", "a"), ("b", "a"))
    graft.functions.Bpe.validateWellFormed(table) // self-pairs ARE well-formed
    val words = Seq("aaaaa", "aaaaaa", "aaaa", "baaaab", "ababab", "")
    val got = kernelEncode(words, table)
    words.foreach { w =>
      assert(got(w) == BpeTools.classicalEncode(w, table), s"word '$w'")
    }
    // run 6: classical gives 2 tokens (aaa aaa? no — (a,a) then (aa,a)):
    // aaaaaa → aa aa aa → (aa,a) never fires on (aa,aa); count 3 via
    // pair (a,a) only... pin the classical reference value explicitly
    assert(got("aaaaaa").trim.split(" ").toSeq == Seq("aa", "aa", "aa"))
    val e = intercept[IllegalArgumentException](
      graft.functions.Bpe.encodeChain(col("w"), table))
    assert(e.getMessage.contains("self-pair"), e.getMessage)
  }

  test("kernel splits by code point: surrogate pairs stay atomic (r18 review #5)") {
    val table = Seq(("a", "b"))
    val astral = "a𝕏b" // a 𝕏 b — U+1D54F outside the BMP
    val got = kernelEncode(Seq(astral, "ab"), table)
    // the astral char is ONE token; (a,b) is not adjacent so no merge
    assert(got(astral) == s" a 𝕏 b ", got(astral))
    assert(got("ab") == " ab ")
    // and the validator counts code points, not UTF-16 units
    graft.functions.Bpe.validateWellFormed(Seq(("𝕏", "a")))
  }

  test("RollingDeque NaN order matches Spark min/max (r18 review #6)") {
    import org.apache.spark.sql.expressions.Window
    val rows = Seq[(Long, Long, Option[Double])](
      (1L, 1L, Some(Double.NaN)), (1L, 2L, Some(3.0)), (1L, 3L, Some(1.0)),
      (1L, 4L, Some(Double.NaN)), (1L, 5L, Some(2.0)), (1L, 6L, None),
      (2L, 7L, Some(Double.NaN)), (2L, 8L, Some(Double.NaN)),
      (2L, 9L, Some(5.0)))
    val df = rows.toDF("k", "ord", "v")
    for (frame <- Seq(2, 3)) {
      val w = Window.partitionBy("k").orderBy("ord")
        .rowsBetween(-(frame - 1), 0)
      val n = count(lit(1)).over(w)
      def canonN(c: org.apache.spark.sql.Column) =
        // NaN != NaN in Scala too — compare via string form
        when(isnan(c), lit("NaN")).otherwise(c.cast("string"))
      val want = df.select(col("ord"),
          canonN(when(n === frame, min(col("v")).over(w))).as("mn"),
          canonN(when(n === frame, max(col("v")).over(w))).as("mx"))
        .as[(Long, Option[String], Option[String])].collect().sortBy(_._1).toSeq
      val got = graft.operators.RollingDeque
        .withRollingMinMax(df, Seq("k"), Seq("ord"), "v", frame)
        .select(col("ord"), canonN(col("roll_min")).as("mn"),
          canonN(col("roll_max")).as("mx"))
        .as[(Long, Option[String], Option[String])].collect().sortBy(_._1).toSeq
      assert(got == want, s"frame $frame: $got vs $want")
      // the NaN rows genuinely bite: some max is NaN while its min is real
      assert(want.exists(r => r._3.contains("NaN") &&
        r._2.exists(_ != "NaN")), s"frame $frame: $want")
    }
  }

  test("RollingDeque ≡ the window-frame formulation: nulls, ties, partial frames, multi-partition") {
    import org.apache.spark.sql.expressions.Window
    // planted geometry: repeated values (deque tie handling), nulls
    // (excluded from min/max but occupying frame slots), an all-null
    // stretch longer than the frame, a key shorter than the frame, and
    // a descending tail (max-deque eviction)
    val rows = Seq.newBuilder[(Long, Long, Option[Double])]
    var ord = 0L
    for (k <- 1L to 3L; i <- 0 until (if (k == 3L) 4 else 120)) {
      ord += 1
      val v =
        if (k == 1L && i >= 30 && i < 45) None
        else if (i % 7 == 0) Some(5.0)
        else if (i > 90) Some(200.0 - i)
        else Some((i * 31 % 17).toDouble + k)
      rows += ((k, ord, v))
    }
    val df = rows.result().toDF("k", "ord", "v").repartition(5)
    for (frame <- Seq(1, 3, 5, 20)) {
      val w = Window.partitionBy("k").orderBy("ord")
        .rowsBetween(-(frame - 1), 0)
      val n = count(lit(1)).over(w)
      val want = df.select(col("k"), col("ord"),
          when(n === frame, min(col("v")).over(w)).as("mn"),
          when(n === frame, max(col("v")).over(w)).as("mx"))
        .as[(Long, Long, Option[Double], Option[Double])]
        .collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      val got = graft.operators.RollingDeque
        .withRollingMinMax(df, Seq("k"), Seq("ord"), "v", frame)
        .select(col("k"), col("ord"), col("roll_min"), col("roll_max"))
        .as[(Long, Long, Option[Double], Option[Double])]
        .collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      assert(got.size == want.size && got == want, s"frame $frame diverges")
    }
    // and the declared wide query's exact shape over the fixture
    val evw = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-63, 0)
    val cnt = count(lit(1)).over(evw)
    val wantWide = graft.tables.Tables(spark, sf).events
      .select(col("event_id"),
        when(cnt === 64, min(col("value")).over(evw)).as("mn"),
        when(cnt === 64, max(col("value")).over(evw)).as("mx"))
      .as[(Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val gotWide = graft.queries.Windows.windowRollingMinmaxWide(spark, sf)
      .select(col("event_id"), col("roll_min"), col("roll_max"))
      .as[(Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gotWide == wantWide && gotWide.nonEmpty)
    // the gate genuinely bites both ways at this sf: some frames full,
    // some not
    assert(gotWide.values.exists(_._1.isDefined) !=
      gotWide.values.forall(_._1.isDefined))
  }

  test("validateWellFormed refuses malformed tables; loadVocab refuses malformed lines") {
    // multi-char part with no producing earlier merge
    intercept[IllegalArgumentException](
      Bpe.validateWellFormed(Seq(("th", "e"))))
    // duplicate pair
    intercept[IllegalArgumentException](
      Bpe.validateWellFormed(Seq(("a", "b"), ("a", "b"))))
    // delimiter inside a part
    intercept[IllegalArgumentException](
      Bpe.validateWellFormed(Seq(("a b", "c"))))
    // empty part
    intercept[IllegalArgumentException](
      Bpe.validateWellFormed(Seq(("", "c"))))
    // well-formed passes, including the shipped default
    Bpe.validateWellFormed(Bpe.Merges)
    Bpe.validateWellFormed(Seq(("a", "b"), ("ab", "c")))
    // the trainer respects occurrence weights: the heavy word's pair
    // merges first despite the light word's lexicographic edge
    assert(Bpe.trainVocab(Seq(("xy", 10L), ("ab", 1L)), 1) == Seq(("x", "y")))
    // malformed file line
    val p = java.nio.file.Files.createTempDirectory("graft_bpe_bad").toString + "/m.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "a b\nnot-a-pair\n")
    intercept[IllegalArgumentException](Bpe.loadVocab(spark, p))
    // comments and blanks are skipped
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "# comment\na b\n\nab c\n")
    assert(Bpe.loadVocab(spark, p) == Seq(("a", "b"), ("ab", "c")))
  }
}
