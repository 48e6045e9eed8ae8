package graft

import org.apache.spark.sql.functions._
import graft.queries.Windows

/** Classical BPE encode: repeatedly find the LOWEST-RANK pair present
  * and merge all its non-overlapping occurrences left-to-right — the
  * textbook loop the rank-order replace chain must equal on a
  * well-formed merge table. Shared by Round17Spec (exhaustive
  * merge-alphabet words) and PropertySpec (random a-z words).
  */
object BpeReference {
  def classicalBpeCount(word: String): Int = {
    val rank = graft.functions.Bpe.Merges.zipWithIndex
      .map { case (p, i) => p -> i }.toMap
    var toks = word.map(_.toString).toVector
    var done = false
    while (!done && toks.length > 1) {
      val best = toks.indices.dropRight(1)
        .flatMap(i => rank.get((toks(i), toks(i + 1))))
        .minOption
      best match {
        case None => done = true
        case Some(r) =>
          val (l, rr) = graft.functions.Bpe.Merges(r)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == rr) {
              out += l + rr; i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.result()
      }
    }
    toks.length
  }
}

/** Round-17 additions: the corrected 131-row ewm-var lattice horizon
  * (r16 ADVICE: the old 135-row guard let a 132–135-row ceiling-value
  * key slip into the silent-null decimal→long overflow), the scan-based
  * [[graft.operators.Ewm.withEwmVar]] fallback (incl. the all-null-
  * prefix NULL rule), the [[Windows.windowEwmVarAuto]] routing that
  * removes the per-key size ceiling without touching the declared
  * query's oracle semantics, the Holt-Winters fixed point, and the BPE
  * chain ≡ classical-loop equality.
  */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  private val alpha = 0.1
  private val beta = 1.0 - alpha

  /** Synthetic events dir: three short keys (one with a null value), the
    * exact latent r16 key (132 rows at the |value| = 10³ ceiling — the
    * one the old 135-row guard waved through), and a 200-row key for the
    * auto routing. Written once per suite in the fixture schema.
    */
  private lazy val ewmRows: Seq[(Long, java.sql.Timestamp, Long, String, Option[Double], String)] = {
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 60000L)
    var eid = 0L
    val b = Seq.newBuilder[(Long, java.sql.Timestamp, Long, String, Option[Double], String)]
    for (u <- 1 to 3; i <- 0 until (10 + u)) {
      eid += 1
      val v = if (u == 2 && i == 3) None
              else Some(((i * 37 + u * 11) % 2001 - 1000).toDouble)
      b += ((eid, ts(i), u.toLong, "click", v, "{}"))
    }
    for (i <- 0 until 132) {
      eid += 1
      b += ((eid, ts(i), 9001L, "click",
        Some(if (i % 2 == 0) 1000.0 else -1000.0), "{}"))
    }
    for (i <- 0 until 200) {
      eid += 1
      val v = if (i == 50) None else Some(((i * 137) % 2001 - 1000).toDouble)
      b += ((eid, ts(i), 9002L, "click", v, "{}"))
    }
    // leading-null long key (r17 review finding): rows before the first
    // non-null value must emit NULL — the lattice's window sum over
    // zero non-null terms — not an invented 0.0 variance
    for (i <- 0 until 140) {
      eid += 1
      val v = if (i < 5) None else Some(if (i % 2 == 0) 1000.0 else -997.0)
      b += ((eid, ts(i), 9003L, "click", v, "{}"))
    }
    b.result()
  }

  private lazy val ewmDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r17_ewm").toString
    ewmRows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** The scan recursion's reference: one sequential decayed-weight fold
    * per key (null advances every decay and the weight sums, adds
    * nothing to Sx/Sxx), variance = (Sw·Sxx − Sx²)/(Sw² − Sww) when the
    * denominator is positive.
    */
  private def scanRef(vals: Seq[Option[Double]]): Seq[Option[Double]] = {
    var sw = 0.0; var sww = 0.0; var sx = 0.0; var sxx = 0.0
    var nn = 0L
    vals.map { ov =>
      val x = ov.getOrElse(0.0)
      if (ov.isDefined) nn += 1
      sw = 1.0 + beta * sw
      sww = 1.0 + beta * beta * sww
      sx = x + beta * sx
      sxx = x * x + beta * sxx
      val den = sw * sw - sww
      // nn == 0: the lattice's window sum over zero non-null terms is
      // NULL, and so is the variance (all-null prefix)
      if (den > 0 && nn > 0) Some((sw * sxx - sx * sx) / den) else None
    }
  }

  /** The declared lattice's exact reference (Round15Spec's device):
    * growing weights, every product quantized to 6 decimals before the
    * EXACT decimal sum, each sum re-entering double via the
    * scaled-BIGINT truncation, final 4-decimal rounding.
    */
  private def latticeRef(vals: Seq[Option[Double]]): Seq[Option[Double]] = {
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def toD(s: BigDecimal) = (s * 1000000).toBigInt.toDouble / 1e6
    var (sw, sww, sx, sxx) =
      (BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0))
    vals.zipWithIndex.map { case (ov, i) =>
      val w = math.pow(beta, -i.toDouble)
      sw += q6(w); sww += q6(w * w)
      ov.foreach { v => sx += q6(v * w); sxx += q6(v * v * w) }
      val (dw, dww, dx, dxx) = (toD(sw), toD(sww), toD(sx), toD(sxx))
      val den = dw * dw - dww
      if (den > 0) Some(r4((dw * dxx - dx * dx) / den) + 0.0) else None
    }
  }

  private def byUser(u: Long): Seq[(Long, Option[Double])] =
    ewmRows.filter(_._3 == u).sortBy(r => (r._2.getTime, r._1))
      .map(r => (r._1, r._5))

  test("windowEwmVar fails loudly on the planted 132-row ceiling key (r16 latent overflow)") {
    val e = intercept[Exception] {
      Windows.windowEwmVar(spark, ewmDir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("weight horizon")),
      s"expected the horizon guard, got: ${messages(e).mkString(" | ")}")
  }

  test("Ewm.withEwmVar matches the naive reliability-weighted variance at any length") {
    val df = ewmRows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(4) // force multi-partition runs so block composition is exercised
    val got = graft.operators.Ewm
      .withEwmVar(df, Seq("user_id"), Seq("ts", "event_id"), "value", alpha)
      .select(col("event_id"), col("ewm_var"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got.size == ewmRows.size)
    for (u <- Seq(1L, 2L, 3L, 9001L, 9002L, 9003L)) {
      val rows = byUser(u)
      val ref = scanRef(rows.map(_._2))
      rows.map(_._1).zip(ref).foreach { case (eid, want) =>
        (got(eid), want) match {
          case (None, None) =>
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) <= 1e-8 * math.max(1.0, math.abs(b)),
              s"event $eid of key $u: $a vs $b")
          case other => fail(s"event $eid of key $u: $other")
        }
      }
    }
    // the reference itself is non-trivial: some defined, varying values
    assert(scanRef(byUser(9002L).map(_._2)).flatten.distinct.size > 10)
    // the leading-null prefix really exercises the null rule: the first
    // two rows of 9003 have den > 0 (n >= 2) yet zero non-null values
    assert(scanRef(byUser(9003L).map(_._2)).take(5).forall(_.isEmpty))
  }

  test("windowEwmVarAuto: long keys route through the scan, short keys stay lattice-exact") {
    val got = Windows.windowEwmVarAuto(spark, ewmDir)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got.size == ewmRows.size)
    // short keys: bit-for-bit the declared lattice semantics
    for (u <- Seq(1L, 2L, 3L)) {
      val rows = byUser(u)
      rows.map(_._1).zip(latticeRef(rows.map(_._2))).foreach {
        case (eid, want) => assert(got(eid) == want, s"event $eid of key $u")
      }
    }
    // long keys (132 and 200 rows — both PAST the lattice horizon, so
    // the declared query raises on this dir while auto must not):
    // 4-decimal grid of the scan reference, one grid step of slack for
    // the block-composition float noise
    for (u <- Seq(9001L, 9002L, 9003L)) {
      val rows = byUser(u)
      rows.map(_._1).zip(scanRef(rows.map(_._2))).foreach {
        case (eid, None) => assert(got(eid).isEmpty, s"event $eid of key $u")
        case (eid, Some(b)) =>
          val a = got(eid).getOrElse(fail(s"event $eid of key $u: null"))
          assert(math.abs(a - b) <= 1.01e-4 + 1e-9 * math.abs(b),
            s"event $eid of key $u: $a vs $b")
      }
    }
    assert(got.values.flatten.exists(_ > 0))
  }

  test("ts_hw_forecast: pure period-7 data is a fixed point — forecast reproduces the week") {
    // user 1: 28 daily observations of x = 5.00 + 0.07·(day mod 7) —
    // zero trend, exact weekly shape. The HW init lands exactly on the
    // fixed point (level = mean 5.21, trend 0, s_j = p_j − p̄), every
    // step reproduces it, and the 7-day-ahead forecast equals the TRUE
    // value of that weekday. user 2: 5 days — under the two-period
    // init, omitted.
    val dir = java.nio.file.Files.createTempDirectory("graft_r17_hw").toString
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 86400000L)
    val rows =
      (0 until 28).map(i => (i.toLong + 1, ts(i), 1L, "click",
        Some(5.0 + 0.07 * (i % 7)), "{}")) ++
      (0 until 5).map(i => (100L + i, ts(i), 2L, "click", Some(1.0), "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Windows.tsHwForecast(spark, dir)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L), s"got $got")
    val r = got.head
    // phase of day 28 is (28−1) mod 7 = 6 → p₆ = 0.42, p̄ = 0.21
    assert(r == ((1L, 28L, 5.21, 0.0, 0.21, 5.42)), s"got $r")
  }

  test("Bpe.tokenCount equals the classical lowest-rank-present loop on every fixture word") {
    import BpeReference.classicalBpeCount
    val fixtureWords = graft.tables.Tables(spark, sf).documents
      .select(explode(split(regexp_replace(lower(col("text")), "[^a-z]+", " "), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
    // plus EVERY 4-letter word over the merge alphabet — 6561 words
    // covering merge-interaction geometry the template fixture's tiny
    // vocabulary (~31 words at sf0.001) cannot
    val alpha = Seq("a", "n", "t", "h", "e", "s", "i", "o", "r")
    val synth = (for (a <- alpha; b <- alpha; c <- alpha; d <- alpha)
      yield a + b + c + d).toDF("w")
    val words = fixtureWords.unionByName(synth).distinct()
    val got = words
      .withColumn("n", graft.functions.Bpe.tokenCount(col("w")))
      .as[(String, Int)].collect()
    assert(got.length > 6000, s"vocabulary too small: ${got.length}")
    got.foreach { case (w, n) =>
      assert(n == classicalBpeCount(w), s"word '$w': chain $n vs classical")
    }
    // merges genuinely fire: multi-char tokens shrink the count
    assert(got.exists { case (w, n) => n < w.length })
    // pathological repeats: two passes take every occurrence
    val runs = Seq("ananananan", "thththth", "aaaa").toDF("w")
      .withColumn("n", graft.functions.Bpe.tokenCount(col("w")))
      .as[(String, Int)].collect().toMap
    assert(runs("ananananan") == classicalBpeCount("ananananan"))
    assert(runs("thththth") == classicalBpeCount("thththth"))
    assert(runs("aaaa") == classicalBpeCount("aaaa"))
  }
}
