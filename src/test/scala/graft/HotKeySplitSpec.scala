package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, Sessionize}

/** The time-range-split hot-key variants must be row-for-row equivalent
  * to their single-partition-per-key originals (SURVEY.md §2.8 asof /
  * sessionize scale notes): the split changes only WHERE the per-key
  * sequence sorts, never what it computes. The fixture is a synthetic
  * hot key whose stream spans many buckets — sessions and matches that
  * cross bucket boundaries are the entire point of the test — plus
  * normal keys and an events-only key to cover the no-right-rows path.
  */
class HotKeySplitSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  // hot key: 3000 events over ~10 days (split=1h → hundreds of buckets),
  // gaps straddling the 15-min session threshold; plus two normal keys
  private lazy val events: DataFrame = {
    val r = new scala.util.Random(42)
    var t = 1000L
    val hot = (1 to 3000).map { _ =>
      t += (if (r.nextInt(8) == 0) 950 + r.nextInt(2000) else 1 + r.nextInt(880))
      ("hot", ts(t))
    }
    val cold = for (k <- Seq("c1", "c2"); i <- 1 to 40)
      yield (k, ts(5000L + i * (if (k == "c1") 700 else 1100)))
    (hot ++ cold).toDF("key", "ts")
  }

  // right side for asof: sparse quotes on the same keys, duplicate-(key,
  // ts) rows included so the deterministic tiebreak is exercised, plus a
  // key absent from the left
  private lazy val quotes: DataFrame = {
    val r = new scala.util.Random(7)
    var t = 800L
    val hot = (1 to 400).flatMap { i =>
      t += 100 + r.nextInt(4000)
      val dup = if (i % 50 == 0) Seq(("hot", ts(t), i * 10 + 1)) else Nil
      ("hot", ts(t), i * 10) +: dup
    }
    val cold = (1 to 10).map(i => ("c1", ts(5000L + i * 2800), 100000 + i))
    val orphan = (1 to 5).map(i => ("zz", ts(i * 1000L), -i))
    (hot ++ cold ++ orphan).toDF("key", "ts", "quote")
  }

  private def collected(df: DataFrame): Seq[Row] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
  private type Row = Seq[Any]
  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq)
    val (ga, gb) = (collected(a), collected(b))
    assert(ga.size == gb.size, s"${ga.size} vs ${gb.size} rows")
    ga.zip(gb).foreach { case (x, y) => assert(x == y) }
  }

  test("fixture genuinely spans many buckets for the hot key") {
    val n = events.filter($"key" === "hot")
      .select((unix_micros($"ts") / (3600L * 1000000L)).cast("long")).distinct().count()
    assert(n >= 100, s"hot key spans only $n hourly buckets")
  }

  test("sessionize split ≡ unsplit on a hot key (sessions cross bucket boundaries)") {
    val whole = Sessionize.withSessionId(events, "ts", Seq("key"), gapSeconds = 900)
    val split = Sessionize.withSessionIdSplit(events, "ts", Seq("key"),
      gapSeconds = 900, splitSeconds = 3600)
    assertSame(whole, split)
    // sanity: the merge path was actually taken — more sessions exist
    // than would if every bucket boundary started a new one
    val nSessions = split.filter($"key" === "hot").agg(max($"session_id")).as[Long].head()
    val nBuckets = events.filter($"key" === "hot")
      .select((unix_micros($"ts") / (3600L * 1000000L)).cast("long")).distinct().count()
    assert(nSessions < nBuckets,
      s"$nSessions sessions vs $nBuckets buckets — no boundary session ever merged")
  }

  test("asof backward split ≡ unsplit, incl. tolerance and allowExact=false") {
    for ((exact, tol) <- Seq((true, None), (false, None),
        (true, Some("INTERVAL 20 MINUTES")))) {
      val whole = AsofJoin.backward(events, quotes, "ts", Seq("key"), Seq("quote"),
        allowExact = exact, tolerance = tol)
      val split = AsofJoin.backwardSplit(events, quotes, "ts", Seq("key"), Seq("quote"),
        splitSeconds = 3600, allowExact = exact, tolerance = tol)
      assertSame(whole, split)
    }
  }

  test("asof forward split ≡ unsplit") {
    val whole = AsofJoin.forward(events, quotes, "ts", Seq("key"), Seq("quote"))
    val split = AsofJoin.forwardSplit(events, quotes, "ts", Seq("key"), Seq("quote"),
      splitSeconds = 3600)
    assertSame(whole, split)
  }

  test("asof nearest split ≡ unsplit, incl. tolerance") {
    for (tol <- Seq(None, Some("INTERVAL 30 MINUTES"))) {
      val whole = AsofJoin.nearest(events, quotes, "ts", Seq("key"), Seq("quote"),
        tolerance = tol)
      val split = AsofJoin.nearestSplit(events, quotes, "ts", Seq("key"), Seq("quote"),
        splitSeconds = 3600, tolerance = tol)
      assertSame(whole, split)
    }
  }

  test("nearest split stays correct when the left plan contains an upstream shuffle") {
    // an earlier nearestSplit stamped monotonically_increasing_id on the
    // left and evaluated that plan once per direction; with a shuffle in
    // the left plan, fetch order (and so the ids) can differ between the
    // two evaluations, silently pairing one row's backward match with
    // another row's forward match. The single-pass rewrite has no
    // per-row id to disagree — this pins the equivalence over a left
    // that genuinely contains an exchange.
    val shuffled = events.repartition(13, $"ts")
    val whole = AsofJoin.nearest(events, quotes, "ts", Seq("key"), Seq("quote"))
    val split = AsofJoin.nearestSplit(shuffled, quotes, "ts", Seq("key"), Seq("quote"),
      splitSeconds = 3600)
    assertSame(whole, split)
  }

  test("sessionize split keeps null keys and null timestamps (window semantics)") {
    // Window.partitionBy groups nulls, so the unsplit variant assigns
    // session ids to null-key and null-ts rows; the split variant's
    // offsets join must be null-safe or those rows silently vanish
    val ev = Seq(
      (Option("k"), Option(ts(100))), (Option("k"), Option(ts(5000))),
      (Option.empty[String], Option(ts(200))),
      (Option.empty[String], Option(ts(300))),
      (Option("k"), Option.empty[Timestamp]),
      (Option.empty[String], Option.empty[Timestamp])
    ).toDF("key", "ts")
    val whole = Sessionize.withSessionId(ev, "ts", Seq("key"), gapSeconds = 900)
    val split = Sessionize.withSessionIdSplit(ev, "ts", Seq("key"),
      gapSeconds = 900, splitSeconds = 3600)
    assert(split.count() == ev.count(), "split variant dropped rows")
    assertSame(whole, split)
  }

  test("asof split variants keep null by-keys (carry join must be null-safe)") {
    // (null, 9000) sits two buckets after the only null-key quote, so
    // its backward match exists ONLY via the carry-in row — which the
    // full_outer summary join drops unless it joins null-safely
    val l = Seq((Option("k"), ts(1000)), (Option.empty[String], ts(1000)),
      (Option.empty[String], ts(9000))).toDF("key", "ts")
    val q = Seq((Option("k"), ts(500), 1), (Option.empty[String], ts(600), 2))
      .toDF("key", "ts", "quote")
    for ((name, whole, split) <- Seq(
        ("backward",
          AsofJoin.backward(l, q, "ts", Seq("key"), Seq("quote")),
          AsofJoin.backwardSplit(l, q, "ts", Seq("key"), Seq("quote"), splitSeconds = 3600)),
        ("forward",
          AsofJoin.forward(l, q, "ts", Seq("key"), Seq("quote")),
          AsofJoin.forwardSplit(l, q, "ts", Seq("key"), Seq("quote"), splitSeconds = 3600)),
        ("nearest",
          AsofJoin.nearest(l, q, "ts", Seq("key"), Seq("quote")),
          AsofJoin.nearestSplit(l, q, "ts", Seq("key"), Seq("quote"), splitSeconds = 3600)))) {
      withClue(name) {
        assert(split.count() == l.count(), s"$name split dropped rows")
        assertSame(whole, split)
      }
    }
  }

  test("split asof matches cross empty buckets (carry-in from far-back quotes)") {
    // a left key whose only quote is days earlier than its events: every
    // event must still match via the carried virtual row
    val l = Seq(("far", ts(1000000L)), ("far", ts(1000500L))).toDF("key", "ts")
    val q = Seq(("far", ts(100L), 7)).toDF("key", "ts", "quote")
    val got = AsofJoin.backwardSplit(l, q, "ts", Seq("key"), Seq("quote"),
      splitSeconds = 3600).select("quote").as[Int].collect().toSeq
    assert(got == Seq(7, 7))
  }
}
