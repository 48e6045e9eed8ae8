package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin
import graft.operators.AsofJoin.AsofStream

/** backwardMulti ≡ the chained per-stream backward form — on a k=5
  * fixture covering ties (stream row at exactly a label's ts),
  * duplicate (key, ts) stream rows (max-payload arbitration), pre-epoch
  * labels (before any stream row → null), keyless users, per-stream
  * tolerance, and allowExact=false; plus the plan pin that makes the
  * operator worth having: ONE hash exchange and ONE Window for any k.
  */
class AsofMultiSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(
    f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")

  /** 12 users × a handful of labels each; labels land on minutes 0-200. */
  private lazy val labels: DataFrame = (for {
    u <- 1 to 12
    i <- 0 until 4
  } yield (u.toLong * 100 + i, u.toLong, ts(u * 3 + i * 37)))
    .toDF("event_id", "u", "ts")

  /** Five streams with deliberately adversarial rows: stream s has rows
    * every (5+s) minutes for users u % 3 != s % 3 is skipped (keyless
    * coverage), EXACT-tie rows at some label timestamps, and a
    * duplicated (u, ts) pair with two payload values (6.0 vs 9.0 — the
    * window contract picks the max, both forms must agree).
    */
  private lazy val streams: Seq[AsofStream] = (0 until 5).map { s =>
    val base = for {
      u <- (1 to 12).filter(_ % 3 != s % 3)
      j <- 0 until 6
    } yield (u.toLong, ts(j * (5 + s) + s), (u * 10 + j).toDouble)
    val exactTies = Seq((1L, ts(1 * 3 + 0 * 37), 777.0))
    val dup = Seq((2L, ts(10 + s), 6.0), (2L, ts(10 + s), 9.0))
    val tol = if (s == 3) Some("INTERVAL 20 MINUTES") else None
    AsofStream((base ++ exactTies ++ dup).toDF("u", "ts", s"f$s"),
      Seq(s"f$s"), tol)
  }

  private def chained(left: DataFrame, ss: Seq[AsofStream],
      allowExact: Boolean): DataFrame =
    ss.foldLeft(left)((acc, s) => AsofJoin.backward(acc, s.right, "ts",
      Seq("u"), s.payload, allowExact, s.tolerance))

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "multi and chained as-of disagree")
  }

  test("k=5 multi-stream PIT join equals the chained backward form") {
    assertSame(
      AsofJoin.backwardMulti(labels, streams, "ts", Seq("u")),
      chained(labels, streams, allowExact = true))
  }

  test("allowExact=false agrees too (ties excluded both ways)") {
    assertSame(
      AsofJoin.backwardMulti(labels, streams, "ts", Seq("u"),
        allowExact = false),
      chained(labels, streams, allowExact = false))
  }

  test("pre-epoch labels get all-null features in both forms") {
    val early = Seq((999L, 1L, ts(0))).toDF("event_id", "u", "ts")
    val multi = AsofJoin.backwardMulti(early, streams, "ts", Seq("u"))
      .collect()
    assert(multi.length == 1)
    // stream 0 has a row at minute 0 for user 1 (j=0, s=0) which TIES —
    // backward allows exact, so f0 matches; streams 1-4 start later
    // columns: event_id, u, ts, f0..f4 — f_i sits at index 3+i
    (1 to 4).foreach(i => assert(multi(0).isNullAt(3 + i),
      s"f$i should be null before the stream epoch"))
    assert(!multi(0).isNullAt(3), "f0 ties exactly at the label ts")
  }

  test("one hash exchange and one Window regardless of k") {
    val multi = AsofJoin.backwardMulti(labels, streams, "ts", Seq("u"))
    multi.write.format("noop").mode("overwrite").save()
    val plan = multi.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    def count(needle: String) =
      plan.sliding(needle.length).count(_ == needle)
    assert(count("Exchange hashpartitioning") == 1,
      s"expected exactly 1 keyed exchange:\n$plan")
    assert(count("Window") == 1, s"expected exactly 1 Window:\n$plan")
  }

  test("payload-name collisions fail loudly") {
    val e1 = intercept[IllegalArgumentException](AsofJoin.backwardMulti(
      labels, Seq(streams(0), streams(0)), "ts", Seq("u")))
    assert(e1.getMessage.contains("unique across streams"))
    val bad = AsofStream(streams(0).right.toDF("u", "ts", "event_id"),
      Seq("event_id"))
    val e2 = intercept[IllegalArgumentException](
      AsofJoin.backwardMulti(labels, Seq(bad), "ts", Seq("u")))
    assert(e2.getMessage.contains("collide"))
  }
}
