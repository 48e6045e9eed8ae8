package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Ewm, MergeUpsert}
import graft.queries.{TextOps, Windows}

/** Round-6 surface: upsert merge, exponentially weighted mean, the
  * composite cleaning pipeline, and mode (their oracle twins cover the
  * fixture-scale hash equality; these specs pin the semantics the
  * oracle can't see — reference recursions, tie-breaks, rejection
  * paths).
  */
class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("upsert replaces matched rows wholesale, inserts new keys, keeps the rest") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val updates = Seq((2L, "B2", 99.0), (9L, "new", 1.0)).toDF("k", "s", "v")
    val got = MergeUpsert.upsert(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B2", 99.0), (3L, "c", 30.0),
      (9L, "new", 1.0)))
  }

  test("upsert rejects mismatched schemas and empty keys") {
    val base = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      MergeUpsert.upsert(base, Seq((1L, 2L)).toDF("k", "other"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      MergeUpsert.upsert(base, base, Seq.empty)
    }
  }

  test("upsert: null update keys fail loudly; validateKeys rejects duplicate-keyed updates (r18 review)") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    // a null-keyed update matches nothing in the outer join — without
    // the guard it surfaced as an ALL-NULL ghost row, not an error
    val nullKey = Seq((Option.empty[Long], Some("x"), Some(1.0)))
      .toDF("k", "s", "v")
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    val e = intercept[Exception](
      MergeUpsert.upsert(base, nullKey, Seq("k")).count())
    assert(msgs(e).contains("ghost row"), msgs(e))
    // duplicate update keys fan the outer join out (base row replaced
    // twice); the optional guard makes the keyed contract checkable
    val dup = Seq((2L, "B1", 1.0), (2L, "B2", 2.0)).toDF("k", "s", "v")
    val e2 = intercept[Exception](
      MergeUpsert.upsert(base, dup, Seq("k"), validateKeys = true).count())
    assert(msgs(e2).contains("not unique"), msgs(e2))
    // clean updates still pass with the guard on
    val ok = Seq((2L, "B2", 99.0)).toDF("k", "s", "v")
    assert(MergeUpsert.upsert(base, ok, Seq("k"), validateKeys = true)
      .count() == 2)
  }

  test("window_ewm matches the pandas-style recursive definition per key") {
    // reference: adjust=true recursion num_t = x_t + (1-a)·num_{t-1},
    // den_t = 1 + (1-a)·den_{t-1}, ewm = num/den — computed sequentially
    // here, as prefix sums in the query
    val alpha = 0.1
    val got = Windows.windowEwm(spark, sf)
      .select("user_id", "event_id", "value", "ewm")
      .as[(Long, Long, Double, Double)].collect()
      .groupBy(_._1).values.map(_.sortBy(_._2))
    got.foreach { rows =>
      var num = 0.0; var den = 0.0
      rows.foreach { case (_, _, v, ewm) =>
        num = v + (1 - alpha) * num
        den = 1 + (1 - alpha) * den
        assert(math.abs(ewm - num / den) < 5e-4,
          s"ewm $ewm vs reference ${num / den}")
      }
    }
    // ordering inside the reference must match the query's (ts, event_id)
    // order — re-sort by event_id is only valid because the fixture's
    // event_ids are assigned in ts order per user; guard that assumption
    val mono = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ok", lag(col("ts"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("event_id"))) <= col("ts"))
      .filter(col("ok") === false).count()
    assert(mono == 0, s"$mono events out of ts order by event_id")
  }

  test("window_rolling_corr scaled-BIGINT moments equal the decimal co-moment form") {
    import org.apache.spark.sql.Column
    // the pre-round-9 formulation: per-row IEEE products accumulated in
    // DECIMAL(38,8) frame sums — kept here as the reference semantics
    // the cheaper integer-moment form must reproduce bit-for-bit
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
    val yD = (col("event_id") % 97).cast("double")
    def dsumW(c: Column) = sum(c.cast("decimal(38,8)")).over(w).cast("double")
    val n = count(lit(1)).over(w)
    val nD = n.cast("double")
    val sx = dsumW(col("value")); val sy = dsumW(yD)
    val sxy = dsumW(col("value") * yD)
    val sxx = dsumW(col("value") * col("value")); val syy = dsumW(yD * yD)
    val denx = nD * sxx - sx * sx
    val deny = nD * syy - sy * sy
    val old = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"),
        when(n === 20 && denx > 0 && deny > 0,
          round((nD * sxy - sx * sy) / sqrt(denx * deny), 4) + lit(0.0))
          .as("roll_corr"))
      .as[(Long, Option[Double])].collect().toMap
    val neu = Windows.windowRollingCorr(spark, sf)
      .select("event_id", "roll_corr")
      .as[(Long, Option[Double])].collect().toMap
    assert(neu.keySet == old.keySet)
    val diff = neu.collect { case (id, v) if old(id) != v => (id, old(id), v) }
    assert(diff.isEmpty, s"rolling-corr forms disagree: ${diff.take(5)}")
  }

  test("agg_mode tie-break is deterministic (smallest value wins)") {
    val df = Seq(("g", "b"), ("g", "a"), ("g", "c"), ("g", "a"), ("g", "b"))
      .toDF("grp", "v")
    val counts = df.groupBy($"grp", $"v").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"grp")
      .orderBy($"n".desc, $"v".asc)
    val got = counts.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select("v").as[String].head()
    assert(got == "a") // a and b tie at 2; a is lexicographically first
  }

  test("Ewm.withEwm equals windowEwm on the fixture (cross-partition carries)") {
    val got = Ewm.withEwm(spark.read.parquet(s"$sf/events.parquet"),
        Seq("user_id"), Seq("ts", "event_id"), "value", alpha = 0.1)
      .select("event_id", "ewm").as[(Long, Double)].collect().toMap
    val want = Windows.windowEwm(spark, sf)
      .select("event_id", "ewm").as[(Long, Double)].collect().toMap
    assert(got.keySet == want.keySet)
    // windowEwm rounds to 4 decimals; the scan is unrounded
    want.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) < 5e-4, s"event $id: ${got(id)} vs $w")
    }
  }

  test("Ewm.withEwm survives streams past the prefix-sum overflow horizon") {
    val n = 20000 // pow(0.9, -20000) overflows double
    val xs = (0 until n).map(i => math.sin(i * 0.37) * 50 + 100)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }
      .toDF("k", "seq", "x").repartition(7) // scrambled, multi-partition input
    val got = Ewm.withEwm(df, Seq("k"), Seq("seq"), "x", alpha = 0.1)
      .select("seq", "ewm").as[(Long, Double)].collect()
      .sortBy(_._1).map(_._2)
    var num = 0.0; var den = 0.0
    xs.zipWithIndex.foreach { case (x, i) =>
      num = x + 0.9 * num; den = 1 + 0.9 * den
      val ref = num / den
      assert(math.abs(got(i) - ref) <= 1e-9 * math.max(1.0, math.abs(ref)),
        s"row $i: ${got(i)} vs $ref")
    }
    // ...and the prefix-sum window phrasing really does break out here —
    // why this operator exists
    val w = Window.partitionBy($"k").orderBy($"seq")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df
      .withColumn("__w", pow(lit(0.9), -(row_number().over(w) - 1).cast("double")))
      .withColumn("e", sum($"x" * $"__w").over(run) / sum($"__w").over(run))
    assert(naive.filter($"e".isNull || isnan($"e")).count() > 0,
      "expected the naive prefix-sum form to overflow on a 20k-row key")
  }

  test("Ewm null values add no numerator weight but advance the denominator") {
    val df = Seq((1L, 1L, Option(10.0)), (1L, 2L, Option.empty[Double]),
      (1L, 3L, Option(20.0))).toDF("k", "seq", "x")
    val got = Ewm.withEwm(df, Seq("k"), Seq("seq"), "x", alpha = 0.5)
      .select("seq", "ewm").as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 10.0) < 1e-12)
    assert(math.abs(got(2L) - 5.0 / 1.5) < 1e-12)
    assert(math.abs(got(3L) - 22.5 / 1.75) < 1e-12)
  }

  test("pipe_clean output rows all pass the gates, keep-first dedup holds") {
    val out = TextOps.pipeClean(spark, sf)
    assert(out.count() > 0)
    assert(out.filter($"quality" < 0.5 || $"predicted_lang" === "und").count() == 0)
    // doc_ids unique (dedup keeps exactly one row per surviving text)
    assert(out.select("doc_id").distinct().count() == out.count())
  }
}
