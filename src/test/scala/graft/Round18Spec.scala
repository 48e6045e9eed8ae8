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
  def chainEncode(word: String, merges: Seq[(String, String)]): String = {
    var s = " " + word.flatMap(c => s"$c ")
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
    // kernel ≡ chain on every corpus word plus words with UNSEEN chars
    val words = (corpus ++ Seq("zzzzq", "expurgate", "")).distinct
    val got = kernelEncode(words, loaded)
    words.foreach { w =>
      assert(got(w) == BpeTools.chainEncode(w, loaded), s"word '$w'")
    }
    // the deep table genuinely bites: some word collapses to ONE token
    assert(words.exists(w => w.length > 3 && got(w).count(_ == ' ') == 2),
      "no word collapsed to a single token — table too shallow to trust")
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
