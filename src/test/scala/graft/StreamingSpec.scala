package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Batch-vs-stream equivalence on replayed fixture events (SURVEY.md
  * §5.4): the same transform applied to the batch frame and to a
  * MemoryStream replay must agree — watermarks never drop data here
  * because the replay is in order and fully drained.
  */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

case class Chg(k: Long, v: Double, seg: String, seq: Long, op: String)

case class CdcEnv(op: String, g_before: String, v_before: java.lang.Long,
    g_after: String, v_after: java.lang.Long)

case class EvP(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSpec {

  private lazy val batchEvents =
    graft.tables.Tables(spark, sf).events
      .select("event_id", "ts", "user_id", "event_type", "value")

  private def replay(name: String, transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: OutputMode = OutputMode.Complete()) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(batchEvents.as[Ev].collect().toSeq)
    Streams.runToMemory(spark, transform(stream.toDF()), name, mode)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val doubles = df.schema.filter(_.dataType == org.apache.spark.sql.types.DoubleType)
      .map(_.name).toSet
    val cols = df.columns.sorted.toSeq.map { c =>
      if (doubles(c)) round(col(c), 4).cast("string").as(c) else col(c).cast("string").as(c)
    }
    df.select(cols: _*).collect().map(_.mkString("|")).toSet
  }

  private def canonStr(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.mkString("|")).toSet
  }

  test("tumbling daily window: stream equals batch") {
    val streamed = replay("t_tumbling", Streams.tumblingDaily _)
    assert(canon(streamed.select("day", "event_type", "n")) ==
      canon(Streams.tumblingDaily(batchEvents).select("day", "event_type", "n")))
  }

  test("streaming signed-agg maintenance: replayed CDC equals the declared agg_refresh_cdc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the WHOLE table is just a CDC log starting from empty: base rows
    // enter as I-records, then the same deterministic D/U/I mutation
    // set the declared query uses — so the maintained (n, sum) per
    // group must equal agg_refresh_cdc's output exactly
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      .as[(Long, String, Long)].collect()
    val baseIns = cust.map { case (_, g, c) =>
      CdcEnv("I", null, null, g, c) }
    val dels = cust.filter(_._1 % 13 == 0).map { case (_, g, c) =>
      CdcEnv("D", g, c, null, null) }
    val upds = cust.filter(r => r._1 % 13 != 0 && r._1 % 11 == 0)
      .map { case (k, g, c) =>
        CdcEnv("U", g, c, if (k % 3 == 0) "MACHINERY" else g, c + 5000L) }
    val ins = cust.filter(_._1 % 17 == 0).map { case (_, g, c) =>
      CdcEnv("I", null, null, g, c + 1000L) }
    val stream = MemoryStream[CdcEnv]
    stream.addData(baseIns.toSeq)
    stream.addData(dels.toSeq ++ upds.toSeq)
    stream.addData(ins.toSeq)
    val maintained = Streams.runToMemory(spark,
      Streams.signedAggMaintenance(stream.toDF()), "t_signed_agg",
      OutputMode.Complete())
    val got = maintained.select(col("g"), col("n"), col("sum_v"))
      .as[(String, Long, Long)].collect().toSet
    val want = graft.queries.Aggregations.aggRefreshCdc(spark, sf)
      .select(col("c_mktsegment"),
        col("n"), round(col("sum_bal") * 100).cast("long"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("streaming OHLC: stream equals batch, and equals the declared ts_resample_ohlc") {
    val streamed = replay("t_ohlc", Streams.ohlcDaily _)
    assert(canon(streamed) == canon(Streams.ohlcDaily(batchEvents)))
    // the streaming twin must also reproduce the declared query's facts
    // (same fixture, same grouping) — not just self-consistency
    val declared = graft.queries.Windows.tsResampleOhlc(spark, sf)
      .select("event_type", "day", "open", "high", "low", "close", "n")
    assert(canon(streamed.select("event_type", "day", "open", "high",
      "low", "close", "n")) == canon(declared))
  }

  test("sliding hourly window: stream equals batch") {
    val streamed = replay("t_sliding", Streams.slidingHourly _)
    assert(canonStr(streamed) == canonStr(Streams.slidingHourly(batchEvents)))
  }

  test("windowed HLL distinct sketch: stream equals batch (mergeable state)") {
    // sketch union is associative+commutative, so the micro-batched
    // stream must land on the IDENTICAL per-window estimates as one
    // batch pass — this is the property that makes sketches streamable
    val streamed = replay("t_sketch", Streams.distinctSketchDaily _)
    assert(canonStr(streamed) == canonStr(Streams.distinctSketchDaily(batchEvents)))
  }

  test("windowed KLL quantile sketch: stream estimates hold the rank bound") {
    import spark.implicits._
    // KLL compaction is merge-order-sensitive (unlike HLL union), so
    // the streamed estimates need not be bit-equal to batch — the
    // contract is the sketch's rank-error bound against EXACT per-day
    // ranks, same envelope as SketchSpec
    val streamed = replay("t_kll", Streams.quantileSketchDaily _)
      .select(col("day"), col("q")).as[(String, Array[Double])].collect()
    assert(streamed.nonEmpty)
    val byDay = batchEvents
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .select("day", "value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (d, vs) => d -> vs.map(_._2).sorted }
    streamed.foreach { case (day, qs) =>
      val vals = byDay(day)
      Seq(0.5, 0.9, 0.99).zip(qs).foreach { case (r, q) =>
        // per-day samples are small and `value` is 2-decimal (ties), so
        // a returned quantile OCCUPIES a rank interval [count(<q),
        // count(<=q)]/n — assert that interval meets the ε envelope,
        // not a point rank (count(<=q) alone overshoots on a tie-run
        // even when the sketch is exact)
        val lo = vals.count(_ < q).toDouble / vals.length
        val hi = vals.count(_ <= q).toDouble / vals.length
        assert(lo - 0.02 < r && r < hi + 0.02,
          s"day $day p$r estimate $q has rank interval [$lo,$hi]")
      }
    }
  }

  test("windowed frequent-items sketch: stream bounds contain exact counts") {
    import spark.implicits._
    val streamed = replay("t_freq", Streams.freqSketchDaily _)
      .select(col("day"), explode(col("top")).as("r"))
      .select(col("day"), col("r.item"), col("r.lb"), col("r.ub"))
      .as[(String, Long, Long, Long)].collect()
    assert(streamed.nonEmpty)
    val truth = batchEvents
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("day", "user_id").count()
      .select("day", "user_id", "count").as[(String, Long, Long)].collect()
      .map { case (d, u, c) => (d, u) -> c }.toMap
    streamed.foreach { case (day, item, lb, ub) =>
      val t = truth((day, item))
      assert(lb <= t && t <= ub,
        s"day $day item $item bounds [$lb,$ub] miss exact $t")
    }
  }

  test("session window: stream equals batch") {
    val streamed = replay("t_session", Streams.sessionized _)
    assert(canonStr(streamed.select("session_start", "user_id", "n_events")) ==
      canonStr(Streams.sessionized(batchEvents).select("session_start", "user_id", "n_events")))
  }

  test("session_window agrees with the batch Sessionize operator") {
    val viaOperator = graft.operators.Sessionize
      .withSessionId(batchEvents, "ts", Seq("user_id"), 1800)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .select("user_id", "n_events", "session_start")
    val viaWindow = Streams.sessionized(batchEvents)
      .select("user_id", "n_events", "session_start")
    assert(canonStr(viaWindow) == canonStr(viaOperator))
  }

  test("stream-stream interval join equals the batch join") {
    val streamed = replay("t_attr", Streams.clickAttribution _, OutputMode.Append())
    val batch = Streams.clickAttribution(batchEvents)
    assert(canonStr(streamed.select("purchase_id", "click_id")) ==
      canonStr(batch.select("purchase_id", "click_id")))
    assert(streamed.count() > 0, "no attributed purchases in fixture replay")
  }

  test("left-outer stream-stream join: nulls emit only on watermark expiry, final output equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // controlled micro-fixture: P1 has a click 10 min earlier (match);
    // P2 has no click at all (must emit with null click_id, but ONLY
    // once the watermark proves no qualifying click can still arrive)
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    def at(mins: Long) = new java.sql.Timestamp(t0.getTime + mins * 60000L)
    val base = Seq(
      Ev(10L, at(-10), 1L, "click", 0.0),
      Ev(11L, at(0), 1L, "purchase", 5.0),
      Ev(12L, at(0), 2L, "purchase", 7.0))
    val stream = MemoryStream[Ev]
    val q = Streams.clickAttributionOuter(stream.toDF()).writeStream
      .format("memory").queryName("t_attr_outer")
      .outputMode(OutputMode.Append()).start()
    stream.addData(base)
    q.processAllAvailable()
    val afterFirst = spark.table("t_attr_outer")
    // watermark after batch 1 sits 2h BEHIND t0, so P2's join window is
    // still open: the matched pair may emit, the null row must NOT
    assert(afterFirst.filter(col("click_id").isNull).count() == 0,
      "outer null emitted while the join window was still open")
    // sentinels 6h ahead advance BOTH side watermarks past P2's window
    // (each side's watermark node only sees its own event_type)
    stream.addData(Seq(Ev(-1L, at(360), -9L, "click", 0.0),
      Ev(-2L, at(360), -9L, "purchase", 0.0)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_attr_outer").filter(col("purchase_id") >= 0)
    // P2 flushed with a null click exactly once: expiry-emission is also
    // the state-store cleanup path, so this pins bounded state
    assert(streamed.filter(col("click_id").isNull)
      .select("purchase_id").as[Long].collect().toSeq == Seq(12L))
    // final streamed output == the batch LEFT join on the same rows
    val batch = Streams.clickAttributionOuter(base.toDF())
    assert(canonStr(streamed.select("purchase_id", "click_id")) ==
      canonStr(batch.select("purchase_id", "click_id")))
  }

  test("left-outer stream-stream join on fixture replay equals batch left join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.as[Ev].collect().toSeq
    val far = new java.sql.Timestamp(
      rows.map(_.ts.getTime).max + 12L * 3600 * 1000)
    val stream = MemoryStream[Ev]
    val q = Streams.clickAttributionOuter(stream.toDF()).writeStream
      .format("memory").queryName("t_attr_outer_full")
      .outputMode(OutputMode.Append()).start()
    stream.addData(rows)
    q.processAllAvailable()
    // flush: sentinels past the horizon expire every parked purchase
    stream.addData(Seq(Ev(-1L, far, -9L, "click", 0.0),
      Ev(-2L, far, -9L, "purchase", 0.0)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_attr_outer_full")
      .filter(col("purchase_id") >= 0)
    val batch = Streams.clickAttributionOuter(batchEvents)
    assert(canonStr(streamed.select("purchase_id", "click_id")) ==
      canonStr(batch.select("purchase_id", "click_id")))
    assert(streamed.filter(col("click_id").isNull).count() > 0,
      "fixture replay should contain unattributed purchases")
  }

  test("full-outer stream-stream join on fixture replay equals batch full join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.as[Ev].collect().toSeq
    val far = new java.sql.Timestamp(
      rows.map(_.ts.getTime).max + 12L * 3600 * 1000)
    val stream = MemoryStream[Ev]
    val q = Streams.clickAttributionFull(stream.toDF()).writeStream
      .format("memory").queryName("t_attr_fullouter")
      .outputMode(OutputMode.Append()).start()
    stream.addData(rows)
    q.processAllAvailable()
    // flush: sentinels past the horizon expire both sides' parked rows
    stream.addData(Seq(Ev(-1L, far, -9L, "click", 0.0),
      Ev(-2L, far, -9L, "purchase", 0.0)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_attr_fullouter")
      .filter(coalesce(col("purchase_id"), lit(0L)) >= 0 &&
        coalesce(col("click_id"), lit(0L)) >= 0)
    val batch = Streams.clickAttributionFull(batchEvents)
    assert(canonStr(streamed.select("purchase_id", "click_id")) ==
      canonStr(batch.select("purchase_id", "click_id")))
    // both unmatched directions must be present in the fixture replay
    assert(streamed.filter(col("click_id").isNull).count() > 0,
      "fixture replay should contain unattributed purchases")
    assert(streamed.filter(col("purchase_id").isNull).count() > 0,
      "fixture replay should contain clicks with no following purchase")
  }

  test("stream-static enrichment join equals the batch join") {
    val dim = batchEvents.select(col("user_id")).distinct()
      .withColumn("segment", col("user_id") % 5)
    val streamed = replay("t_enrich", Streams.enrichedSegmentTotals(_, dim))
    val batch = Streams.enrichedSegmentTotals(batchEvents, dim)
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() == 5)
  }

  test("streaming seasonal gate equals the batch gate over the same profile") {
    // profile trained on the full history; gate 0.5 because sf0.001's
    // 2-row cells top out at |z| = 1/sqrt(2)
    val profile = Streams.seasonalProfile(batchEvents)
    val streamed = replay("t_seasonal",
      Streams.seasonalGate(_, profile, threshold = 0.5), OutputMode.Append())
    val batch = Streams.seasonalGate(batchEvents, profile, threshold = 0.5)
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0, "fixture must breach the 0.5-sigma gate")
    // the declared query is the SAME scoring plus the global top-k:
    // every streamed z must equal the batch z for its event
    val zs = batch.select(col("event_id"), col("z"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    streamed.select(col("event_id"), col("z")).collect().foreach { r =>
      assert(zs(r.getLong(0)) == r.getDouble(1))
    }
  }

  test("streaming A/B monitor converges to the declared batch t-test") {
    val streamed = replay("t_abmon", Streams.abMonitor)
    val batch = Streams.abMonitor(batchEvents)
    assert(canon(streamed) == canon(batch))
    // and the batch form of the monitor IS the declared query
    val declared = graft.queries.Aggregations.aggAbTtest(
      spark, "/root/testdata/sf0.001")
    assert(canon(batch) == canon(declared))
    assert(streamed.count() > 0)
  }

  test("stateful dedup drops duplicate event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = batchEvents.as[Ev].collect().take(50)
    val stream = MemoryStream[Ev]
    stream.addData(rows.toSeq ++ rows.take(10).toSeq) // re-deliver 10 dups
    val out = Streams.runToMemory(spark,
      Streams.dedupStream(stream.toDF()), "t_dedup", OutputMode.Append())
    assert(out.count() == 50)
    assert(out.select("event_id").distinct().count() == 50)
  }

  test("checkpoint resume: two query incarnations process each file exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    new java.io.File(src).mkdirs()
    val slice = batchEvents.limit(100)

    def runOnce(): Unit = {
      val q = spark.readStream.schema(slice.schema).json(src)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // first incarnation sees file 1; second sees files 1+2 in the
    // source dir but must only process the new one (checkpoint log)
    slice.filter(col("event_id") < 50).coalesce(1).write.mode("append").json(src)
    runOnce()
    slice.filter(col("event_id") >= 50).coalesce(1).write.mode("append").json(src)
    runOnce()

    val out = spark.read.parquet(sink)
    assert(out.count() == slice.count(), "exactly-once violated across restarts")
    assert(out.select("event_id").distinct().count() == slice.count())
  }

  test("streaming simhash near-dup equals the batch operator on a replayed corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val originals = docs.as[(Long, String)].collect().toSeq
    val plants = originals.take(20).map { case (id, t) => (id + 5000L, t) }
    val stream = MemoryStream[(Long, String)]
    // two REAL micro-batches (drain between addData calls) so the pair
    // detection for the plants must read originals' signatures back
    // from the flatMapGroupsWithState store, not from the same batch
    val q = Streams.simHashPairsStream(spark,
        stream.toDS().toDF("doc_id", "text")).toDF()
      .writeStream.format("memory").queryName("t_neardup")
      .outputMode(OutputMode.Append()).start()
    stream.addData(originals)
    q.processAllAvailable()
    stream.addData(plants)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("t_neardup")
      .select("a", "b", "hamming").distinct()
    val batchTwin = graft.operators.NearDup.simHashPairs(
      docs.unionByName(plants.toDF("doc_id", "text")), "doc_id", "text",
      maxHamming = 3)
    assert(canonStr(out) == canonStr(batchTwin))
    // every planted identical copy must be flagged at hamming 0
    val zero = out.filter(col("hamming") === 0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(originals.take(20).map(_._1).forall(id => zero.contains((id, id + 5000L))))
  }

  test("streaming near-dup TTL drops expired state, keeps in-horizon pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = "spark makes big data processing fast and reliable today"
    def at(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val ttlMs = 3600L * 1000L // 1 h horizon, all in event time — no sleeps
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = Streams.simHashPairsStream(spark,
        stream.toDS().toDF("doc_id", "text", "ts"), ttlMs = ttlMs).toDF()
      .writeStream.format("memory").queryName("t_ttl")
      .outputMode(OutputMode.Append()).start()
    // batch 1: doc 1 at t=0
    stream.addData(Seq((1L, text, at(0))))
    q.processAllAvailable()
    // batch 2, one horizon + 60 s later: the same text as docs 3+4.
    // doc 1's entries are out of horizon (pruned on bucket touch), so
    // only the in-batch pair (3,4) may be emitted
    stream.addData(Seq((3L, text, at(3660)), (4L, text, at(3660))))
    q.processAllAvailable()
    // batch 3, 120 s after batch 2: still within the horizon of docs
    // 3+4 — cross-batch detection against live state must still work
    stream.addData(Seq((5L, text, at(3780))))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("t_ttl").select("a", "b").distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 4L), (3L, 5L), (4L, 5L)),
      s"expected in-horizon pairs only, got $pairs")
  }

  test("near-dup micro-batch spanning more than the ttl still emits in-horizon pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = "spark makes big data processing fast and reliable today"
    def at(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val ttlMs = 3600L * 1000L
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = Streams.simHashPairsStream(spark,
        stream.toDS().toDF("doc_id", "text", "ts"), ttlMs = ttlMs).toDF()
      .writeStream.format("memory").queryName("t_span")
      .outputMode(OutputMode.Append()).start()
    stream.addData(Seq((1L, text, at(0))))
    q.processAllAvailable()
    // ONE batch spanning 1.5 h: doc 2 (t=0.5 h) is within horizon of doc
    // 1, doc 3 (t=1.5 h) is not. A state prune anchored on the NEWEST
    // arrival (the pre-fix behavior) would expire doc 1 before doc 2 was
    // compared against it and silently lose the (1,2) pair; the fixed
    // prune anchors on the oldest arrival and leaves the horizon to the
    // per-pair |ts - pts| <= ttl check
    stream.addData(Seq((2L, text, at(1800)), (3L, text, at(5400))))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("t_span").select("a", "b").distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)),
      s"expected exactly the in-horizon pairs, got $pairs")
  }

  test("streaming funnel: out-of-order arrivals retroactively complete the chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    val stream = MemoryStream[Ev]
    val q = Streams.funnelStages(spark, stream.toDF()).toDF()
      .writeStream.format("memory").queryName("t_funnel")
      .outputMode(OutputMode.Update()).start()
    // batch 1: the user's click and purchase arrive BEFORE their view
    stream.addData(Seq(
      Ev(1, at(5), 100L, "click", 1.0),
      Ev(2, at(10), 100L, "purchase", 1.0)))
    q.processAllAvailable()
    val mid = spark.table("t_funnel").orderBy(col("stage")) // only batch-1 rows yet
      .select("user_id", "stage").as[(Long, Int)].collect().toSeq
    assert(mid == Seq((100L, 0)), s"no view yet -> stage 0, got $mid")
    // batch 2: the late-but-in-horizon view lowers t1; the STORED click
    // and purchase must be promoted to t2/t3 in the same touch
    stream.addData(Seq(Ev(3, at(0), 100L, "view", 1.0)))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("t_funnel")
      .groupBy("user_id").agg(max("stage").as("stage"))
      .as[(Long, Int)].collect().toMap
    assert(fin == Map(100L -> 3), s"retroactive chain must complete, got $fin")
    val last = spark.table("t_funnel").filter(col("stage") === 3)
      .select("t1", "t2", "t3").as[(Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(last == (Some(at(0).getTime), Some(at(5).getTime), Some(at(10).getTime)))
  }

  test("streaming funnel final snapshot equals the batch funnel chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val rows = batchEvents.as[Ev].collect().toSeq
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val q = Streams.funnelStages(spark, stream.toDF()).toDF()
      .writeStream.format("memory").queryName("t_funnel_full")
      .outputMode(OutputMode.Update()).start()
    stream.addData(h1); q.processAllAvailable()
    stream.addData(h2); q.processAllAvailable()
    q.stop()
    // latest snapshot per user -> users at stage >= k must equal the
    // batch funnel's per-step user counts
    val latest = spark.table("t_funnel_full")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("stage").desc)))
      .filter(col("rn") === 1)
    val byStage = latest.groupBy().agg(
      sum(when(col("stage") >= 1, 1L).otherwise(0L)),
      sum(when(col("stage") >= 2, 1L).otherwise(0L)),
      sum(when(col("stage") >= 3, 1L).otherwise(0L)))
      .as[(Long, Long, Long)].collect().head
    val batch = graft.queries.EventAnalytics.funnelConversion(spark, sf)
      .select("n_users").as[Long].collect().toSeq
    assert(Seq(byStage._1, byStage._2, byStage._3) == batch,
      s"stream $byStage vs batch $batch")
    assert(byStage._3 > 0)
  }

  // ---------------------------------------------- streaming as-of enrichment

  private lazy val asofDimsB = batchEvents
    .filter(col("event_type") === "click" && col("event_id") % 5 === 0)
    .select(col("user_id"), col("ts").as("valid_from"),
      concat(lit("s"), col("event_id") % 3).as("segment"))
  private lazy val asofEventsB = batchEvents
    .filter(col("event_type") === "purchase")
    .select("user_id", "ts", "event_id", "value")

  private def asofBatchTwin: org.apache.spark.sql.DataFrame =
    graft.operators.AsofJoin.backward(asofEventsB,
      asofDimsB.withColumnRenamed("valid_from", "ts"),
      ts = "ts", by = Seq("user_id"), payload = Seq("segment"))

  private def runEnrichAsOf(name: String,
      batches: Seq[(Seq[Ev], Seq[(Long, java.sql.Timestamp, String)])],
      watermarkDelay: Option[String] = None,
      probe: Option[org.apache.spark.util.CollectionAccumulator[java.lang.Long]] = None) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evStream = MemoryStream[Ev]
    val dimStream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val streamed = Streams.enrichAsOf(spark, evStream.toDF(),
      dimStream.toDF().toDF("user_id", "valid_from", "segment"),
      watermarkDelay = watermarkDelay, stateSizeProbe = probe)
    // the FIRST batch goes in before start() so it lands in one
    // micro-batch (a running query's trigger can fire BETWEEN two
    // addData calls and split them); later batches add dims before
    // events — a trigger sneaking in between only moves the dims
    // earlier, which pairs identically
    batches.headOption.foreach { case (evs, dims) =>
      if (dims.nonEmpty) dimStream.addData(dims)
      if (evs.nonEmpty) evStream.addData(evs)
    }
    val q = streamed.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    batches.drop(1).foreach { case (evs, dims) =>
      if (dims.nonEmpty) dimStream.addData(dims)
      if (evs.nonEmpty) evStream.addData(evs)
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name)
  }

  test("streaming as-of enrichment equals batch AsofJoin.backward (one batch)") {
    import spark.implicits._
    val evs = asofEventsB
      .select(col("event_id"), col("ts"), col("user_id"),
        lit("purchase").as("event_type"), col("value")).as[Ev].collect().toSeq
    val dims = asofDimsB.as[(Long, java.sql.Timestamp, String)].collect().toSeq
    val streamed = runEnrichAsOf("t_asof_one", Seq((evs, dims)))
    assert(canon(streamed.select("user_id", "event_id", "value", "segment")) ==
      canon(asofBatchTwin.select("user_id", "event_id", "value", "segment")))
    assert(streamed.filter(col("segment").isNotNull).count() > 0)
  }

  test("streaming as-of enrichment equals batch across time-split batches") {
    // split both streams at the median ts: versions persist in state
    // across the batch boundary, and no batch-1 event can need a
    // batch-2 version (its valid_from is later than the event's ts)
    import spark.implicits._
    val evs = asofEventsB
      .select(col("event_id"), col("ts"), col("user_id"),
        lit("purchase").as("event_type"), col("value")).as[Ev].collect().toSeq
      .sortBy(_.ts.getTime)
    val dims = asofDimsB.as[(Long, java.sql.Timestamp, String)].collect().toSeq
      .sortBy(_._2.getTime)
    val cut = evs(evs.length / 2).ts.getTime
    val streamed = runEnrichAsOf("t_asof_split", Seq(
      (evs.filter(_.ts.getTime < cut), dims.filter(_._2.getTime < cut)),
      (evs.filter(_.ts.getTime >= cut), dims.filter(_._2.getTime >= cut))))
    assert(canon(streamed.select("user_id", "event_id", "value", "segment")) ==
      canon(asofBatchTwin.select("user_id", "event_id", "value", "segment")))
  }

  test("as-of state: floor version wins for out-of-order events; late dims append-only") {
    import spark.implicits._
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // batch 1: two versions (A@1, B@20) and an event at 25 (matches B);
    // also an event at 2 for user 9 with NO version yet (emits null)
    // batch 2: an OUT-OF-ORDER event at 10 must match A (floor), not
    // latest B; user 9's late version A@1 arrives — already-emitted
    // null row stays (append-only), but a new event at 3 matches it
    val streamed = runEnrichAsOf("t_asof_floor", Seq(
      (Seq(Ev(101, at(25), 1L, "purchase", 1.0),
           Ev(901, at(2), 9L, "purchase", 1.0)),
       Seq((1L, at(1), "A"), (1L, at(20), "B"))),
      (Seq(Ev(102, at(10), 1L, "purchase", 1.0),
           Ev(902, at(3), 9L, "purchase", 1.0)),
       Seq((9L, at(1), "A")))))
    val got = streamed.select("event_id", "segment")
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(101L -> Some("B"), 901L -> None,
      102L -> Some("A"), 902L -> Some("A")), s"got $got")
  }

  // ------------------------------------------- streaming k-stream PIT

  /** k=3 version streams carved from the click events: sid by event_id
    * mod 3, features named per-stream so the batch twin's payload-name
    * uniqueness contract holds.
    */
  private lazy val asofMultiDimsB = batchEvents
    .filter(col("event_type") === "click" && col("event_id") % 5 === 0)
    .select((col("event_id") % 3).cast("int").as("sid"),
      col("user_id"), col("ts").as("valid_from"),
      concat(lit("f"), col("event_id") % 3, lit("_v"), col("event_id") % 7)
        .as("feature"))

  private def asofMultiBatchTwin: org.apache.spark.sql.DataFrame = {
    import graft.operators.AsofJoin
    val streams = (0 until 3).map { i =>
      AsofJoin.AsofStream(
        asofMultiDimsB.filter(col("sid") === i)
          .select(col("user_id"), col("valid_from").as("ts"),
            col("feature").as(s"f$i")),
        payload = Seq(s"f$i"))
    }
    AsofJoin.backwardMulti(asofEventsB, streams, ts = "ts", by = Seq("user_id"))
  }

  private def runEnrichAsOfMulti(name: String,
      batches: Seq[(Seq[Ev], Seq[(Int, Long, java.sql.Timestamp, String)])],
      watermarkDelay: Option[String] = None,
      probe: Option[org.apache.spark.util.CollectionAccumulator[java.lang.Long]] = None) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evStream = MemoryStream[Ev]
    val dimStream = MemoryStream[(Int, Long, java.sql.Timestamp, String)]
    val streamed = Streams.enrichAsOfMulti(spark, evStream.toDF(),
      dimStream.toDF().toDF("sid", "user_id", "valid_from", "feature"), k = 3,
      watermarkDelay = watermarkDelay, stateSizeProbe = probe)
    batches.headOption.foreach { case (evs, dims) =>
      if (dims.nonEmpty) dimStream.addData(dims)
      if (evs.nonEmpty) evStream.addData(evs)
    }
    val q = streamed.toDF().writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    batches.drop(1).foreach { case (evs, dims) =>
      if (dims.nonEmpty) dimStream.addData(dims)
      if (evs.nonEmpty) evStream.addData(evs)
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name)
  }

  private def multiFeatureCols(df: org.apache.spark.sql.DataFrame) =
    df.select(col("user_id"), col("event_id"), col("value"),
      col("features")(0).as("f0"), col("features")(1).as("f1"),
      col("features")(2).as("f2"))

  test("streaming k-stream as-of equals batch backwardMulti (one batch)") {
    import spark.implicits._
    val evs = asofEventsB
      .select(col("event_id"), col("ts"), col("user_id"),
        lit("purchase").as("event_type"), col("value")).as[Ev].collect().toSeq
    val dims = asofMultiDimsB
      .as[(Int, Long, java.sql.Timestamp, String)].collect().toSeq
    val streamed = runEnrichAsOfMulti("t_asof_multi_one", Seq((evs, dims)))
    assert(canon(multiFeatureCols(streamed)) ==
      canon(asofMultiBatchTwin.select("user_id", "event_id", "value", "f0", "f1", "f2")))
    // the fixture must actually exercise all three slots
    for (i <- 0 until 3)
      assert(streamed.filter(col("features")(i).isNotNull).count() > 0,
        s"slot $i never matched — fixture too thin")
  }

  test("streaming k-stream as-of equals batch across time-split batches") {
    import spark.implicits._
    val evs = asofEventsB
      .select(col("event_id"), col("ts"), col("user_id"),
        lit("purchase").as("event_type"), col("value")).as[Ev].collect().toSeq
      .sortBy(_.ts.getTime)
    val dims = asofMultiDimsB
      .as[(Int, Long, java.sql.Timestamp, String)].collect().toSeq
      .sortBy(_._3.getTime)
    val cut = evs(evs.length / 2).ts.getTime
    val streamed = runEnrichAsOfMulti("t_asof_multi_split", Seq(
      (evs.filter(_.ts.getTime < cut), dims.filter(_._3.getTime < cut)),
      (evs.filter(_.ts.getTime >= cut), dims.filter(_._3.getTime >= cut))))
    assert(canon(multiFeatureCols(streamed)) ==
      canon(asofMultiBatchTwin.select("user_id", "event_id", "value", "f0", "f1", "f2")))
  }

  test("k-stream state: slots independent; out-of-order floor; same-batch pairing") {
    import spark.implicits._
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // batch 1: slot 0 gets A@1 and B@20, slot 1 gets X@5; an event at 25
    // pairs with versions delivered in the SAME batch (B, X, null).
    // batch 2: an OUT-OF-ORDER event at 10 floors to (A, X, null) — slot
    // 0's floor search, not its latest, decides; slot 2's first version
    // Z@2 arrives late and enriches the new event but never the emitted
    // ones; a duplicate (sid 1, ts 5) update max-merges to Y.
    val streamed = runEnrichAsOfMulti("t_asof_multi_state", Seq(
      (Seq(Ev(201, at(25), 1L, "purchase", 1.0)),
       Seq((0, 1L, at(1), "A"), (0, 1L, at(20), "B"), (1, 1L, at(5), "X"))),
      (Seq(Ev(202, at(10), 1L, "purchase", 1.0)),
       Seq((2, 1L, at(2), "Z"), (1, 1L, at(5), "Y")))))
    val got = streamed.select(col("event_id"),
      col("features")(0), col("features")(1), col("features")(2))
      .as[(Long, Option[String], Option[String], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      201L -> ((Some("B"), Some("X"), None)),
      202L -> ((Some("A"), Some("Y"), Some("Z")))), s"got $got")
  }

  test("watermarked k-stream as-of: replay equals backwardMulti unchanged") {
    import spark.implicits._
    // same time-split replay as the unwatermarked parity test — batches
    // split at the median ts, so nothing arrives behind the watermark
    // and the emissions must be bit-identical to the batch twin
    val evs = asofEventsB
      .select(col("event_id"), col("ts"), col("user_id"),
        lit("purchase").as("event_type"), col("value")).as[Ev].collect().toSeq
      .sortBy(_.ts.getTime)
    val dims = asofMultiDimsB
      .as[(Int, Long, java.sql.Timestamp, String)].collect().toSeq
      .sortBy(_._3.getTime)
    val cut = evs(evs.length / 2).ts.getTime
    val streamed = runEnrichAsOfMulti("t_asof_multi_wm", Seq(
      (evs.filter(_.ts.getTime < cut), dims.filter(_._3.getTime < cut)),
      (evs.filter(_.ts.getTime >= cut), dims.filter(_._3.getTime >= cut))),
      watermarkDelay = Some("0 seconds"))
    assert(canon(multiFeatureCols(streamed)) ==
      canon(asofMultiBatchTwin.select("user_id", "event_id", "value", "f0", "f1", "f2")))
  }

  test("watermark floor prunes retired as-of versions; the kept floor still matches") {
    import spark.implicits._
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val probe = spark.sparkContext.collectionAccumulator[java.lang.Long]("asof_state_size")
    // batch 1: five versions + an event at 6 — the touch runs at
    // watermark 0 (it advances only AFTER a batch), so all 5 stay.
    // batch 2: event at 10 runs at watermark = batch-1 max (10:06) —
    // v1..v4 are unreachable by any non-late future event and must be
    // dropped; v5 (the newest <= floor) stays and still enriches.
    val streamed = runEnrichAsOf("t_asof_prune", Seq(
      (Seq(Ev(301, at(6), 1L, "purchase", 1.0)),
       (1 to 5).map(i => (1L, at(i), s"v$i"))),
      (Seq(Ev(302, at(10), 1L, "purchase", 1.0)), Seq.empty)),
      watermarkDelay = Some("0 seconds"), probe = Some(probe))
    val got = streamed.select("event_id", "segment")
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(301L -> Some("v5"), 302L -> Some("v5")), s"got $got")
    import scala.jdk.CollectionConverters._
    // the r17 idle-key timeout sweep adds extra probe records (each a
    // no-emission prune pass), so assert the shape, not the exact list:
    // exactly one pre-floor touch saw all 5 versions, and every touch
    // after the floor passed — data or sweep — holds exactly 1
    val sizes = probe.value.asScala.map(_.toLong).toList
    assert(sizes.count(_ == 5L) == 1 && sizes.filter(_ != 5L).forall(_ == 1L)
        && sizes.exists(_ == 1L),
      s"state sizes $sizes — expected one 5 before the floor passed, all 1 after")
  }

  test("idle-key timeout sweep prunes a quiet key as OTHERS advance the watermark") {
    import spark.implicits._
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val probe = spark.sparkContext.collectionAccumulator[java.lang.Long]("asof_idle_sweep")
    // batch 1: key 1 gets 5 versions + one event, then goes QUIET.
    // batches 2-3: only key-2 traffic (no dims — key 2's touches record
    // 0), advancing the GLOBAL watermark past key 1's versions. The r16
    // data-touch-only prune left an idle key at 5 forever (r16 ADVICE);
    // the r17 event-time-timeout sweep must shrink it to 1 without key 1
    // receiving a single further row.
    runEnrichAsOf("t_asof_idle", Seq(
      (Seq(Ev(401, at(6), 1L, "purchase", 1.0)),
       (1 to 5).map(i => (1L, at(i), s"v$i"))),
      (Seq(Ev(402, at(30), 2L, "purchase", 1.0)), Seq.empty),
      (Seq(Ev(403, at(50), 2L, "purchase", 1.0)), Seq.empty)),
      watermarkDelay = Some("0 seconds"), probe = Some(probe))
    import scala.jdk.CollectionConverters._
    val sizes = probe.value.asScala.map(_.toLong).toList
    // key 1 recorded 5 exactly once (its only data touch, pre-floor);
    // every later key-1 record can only come from a sweep (size 1)
    assert(sizes.count(_ == 5L) == 1, s"sizes $sizes")
    assert(sizes.contains(1L), s"no idle sweep fired: $sizes")
    assert(sizes.forall(s => s == 0L || s == 1L || s == 5L), s"sizes $sizes")
  }

  test("multi as-of idle-key timeout sweep prunes quiet keys' slots") {
    import spark.implicits._
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val probe = spark.sparkContext.collectionAccumulator[java.lang.Long]("asof_multi_idle")
    runEnrichAsOfMulti("t_asof_multi_idle", Seq(
      (Seq(Ev(501, at(6), 1L, "purchase", 1.0)),
       (1 to 5).map(i => (0, 1L, at(i), s"f0_v$i"))),
      (Seq(Ev(502, at(30), 2L, "purchase", 1.0)), Seq.empty),
      (Seq(Ev(503, at(50), 2L, "purchase", 1.0)), Seq.empty)),
      watermarkDelay = Some("0 seconds"), probe = Some(probe))
    import scala.jdk.CollectionConverters._
    val sizes = probe.value.asScala.map(_.toLong).toList
    assert(sizes.count(_ == 5L) == 1, s"sizes $sizes")
    assert(sizes.contains(1L), s"no idle sweep fired: $sizes")
    assert(sizes.forall(s => s == 0L || s == 1L || s == 5L), s"sizes $sizes")
  }

  test("streaming Holt-Winters: last emission per user equals the batch ts_hw_forecast") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch query's own daily derivation, replayed as a closed-day
    // stream split at an arbitrary day boundary (state must carry the
    // fold across it, including users still inside the init buffer)
    val daily = graft.tables.Tables(spark, sf).events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("xc"))
      .select(col("user_id"), col("day").cast("string").as("day"), col("xc"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._2)
    val cut = daily(daily.length / 3)._2 // a third in: most users mid-init
    val stream = MemoryStream[(Long, String, Long)]
    stream.addData(daily.filter(_._2 < cut))
    val q = Streams.hwForecastStream(spark,
        stream.toDF().toDF("user_id", "day", "xc")).toDF()
      .writeStream.format("memory").queryName("t_hw_stream")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    stream.addData(daily.filter(_._2 >= cut))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("t_hw_stream")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("n_days").desc)))
      .filter(col("rn") === 1).drop("rn")
    val want = canon(graft.queries.Windows.tsHwForecast(spark, sf)
      .select("user_id", "n_days", "level", "trend", "seasonal", "forecast_7d"))
    assert(canon(last.select("user_id", "n_days", "level", "trend",
      "seasonal", "forecast_7d")) == want)
    assert(spark.table("t_hw_stream").count() >
      last.count(), "expected per-day emissions, not just finals")
  }

  // ---------------------------------------------- streaming drawdown

  test("streaming drawdown equals the declared window_drawdown (one batch and ts-split)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val want = canon(graft.queries.Windows.windowDrawdown(spark, sf)
      .select("user_id", "event_id", "peak", "drawdown", "max_drawdown"))
    def run(name: String, splits: Seq[Seq[Ev]]): org.apache.spark.sql.DataFrame = {
      val stream = MemoryStream[Ev]
      stream.addData(splits.head)
      val q = Streams.runningDrawdown(spark, stream.toDF()).toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      q.processAllAvailable()
      splits.drop(1).foreach { s =>
        stream.addData(s); q.processAllAvailable()
      }
      q.stop()
      spark.table(name)
    }
    val evs = batchEvents.as[Ev].collect().toSeq
    assert(canon(run("t_dd_one", Seq(evs))) == want)
    // ts-split replay: cumulative state survives the batch boundary and
    // no batch-2 event predates batch 1, so the stream equals the batch
    val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
    val cut = sorted(sorted.length / 2).ts.getTime
    assert(canon(run("t_dd_split", Seq(
      sorted.filter(_.ts.getTime < cut), sorted.filter(_.ts.getTime >= cut)))) == want)
    assert(want.nonEmpty)
  }

  test("mapGroupsWithState running counts equal batch groupBy counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(batchEvents.as[Ev].collect().toSeq)
    val q = Streams.runningUserCounts(spark, stream.toDF()).toDF()
      .writeStream.format("memory").queryName("t_state")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_state")
      .groupBy("user_id").agg(max("n").as("n")) // last update per key
    val expected = batchEvents.groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(canonStr(got) == canonStr(expected))
  }

  /** Replay `records` through `transform` in two REAL micro-batches:
    * start first, then add + drain twice — data added before start
    * would all land in one initial batch and the incremental property
    * wouldn't be exercised (same pattern as the near-dup stream tests).
    */
  private def replayTwoBatches(
      records: Seq[graft.operators.Multimodal.MediaRecord],
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[graft.operators.Multimodal.MediaRecord]
    val q = transform(stream.toDF()).writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append()).start()
    val half = records.length / 2
    stream.addData(records.take(half))
    q.processAllAvailable()
    stream.addData(records.drop(half))
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming audio decode equals batch decode on a replayed planted corpus") {
    import spark.implicits._
    import graft.operators.Multimodal
    val ids = (0L until 150L).toDF("doc_id")
    val records = Multimodal.plantedAudio(spark, ids, "doc_id")
      .as[Multimodal.MediaRecord].collect().toSeq
    val streamed = replayTwoBatches(records,
      df => Streams.decodeAudioStream(spark, df), "t_audio_decode")
    val batch = Multimodal.decodeAudioStats(spark,
      Multimodal.plantedAudio(spark, ids, "doc_id")).toDF()
    assert(canonStr(streamed) == canonStr(batch))
    assert(streamed.count() == 150)
  }

  test("streaming image decode equals batch decode on a replayed planted corpus") {
    import spark.implicits._
    import graft.operators.Multimodal
    val ids = (0L until 120L).toDF("doc_id")
    val records = Multimodal.plantedImages(spark, ids, "doc_id")
      .as[Multimodal.MediaRecord].collect().toSeq
    val streamed = replayTwoBatches(records,
      df => Streams.decodeImageStream(spark, df), "t_image_decode")
    val batch = Multimodal.decodeImageStats(spark,
      Multimodal.plantedImages(spark, ids, "doc_id")).toDF()
    assert(canonStr(streamed) == canonStr(batch))
    assert(streamed.count() == 120)
  }

  test("streaming upsert sink: final table equals a batch latest-per-key reduce") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("upsert_sink").toString
    val stream = MemoryStream[Ev]
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val q = Streams.upsertSink(stream.toDF(), s"$dir/table", s"$dir/ckpt")
    try {
      stream.addData(Seq(
        Ev(1, at(0), 100L, "click", 1.0), Ev(2, at(1), 200L, "view", 2.0),
        Ev(3, at(2), 100L, "click", 3.0)))
      q.processAllAvailable()
      // batch 2: update user 200, insert user 300
      stream.addData(Seq(
        Ev(4, at(3), 200L, "click", 4.0), Ev(5, at(4), 300L, "view", 5.0)))
      q.processAllAvailable()
    } finally q.stop()
    val table = Streams.readUpsertTable(spark, s"$dir/table")
      .select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect().toSet
    // latest row per user across all batches
    assert(table == Set((100L, 3L, 3.0), (200L, 4L, 4.0), (300L, 5L, 5.0)))
  }

  test("upsert sink auto-maintenance: version count bounded mid-stream, result ≡ maintenance off") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // r17 verdict #3: the sink schedules its own retention from the
    // foreachBatch slot (the single-writer seat vacuumVersions
    // requires): log-structured layout (snapshotEvery=2) + vacuum every
    // 2 batches keeping 2 snapshots. The maintained table must stay
    // bounded DURING the stream and read identically to the
    // unmaintained twin at the end.
    val dir = java.nio.file.Files.createTempDirectory("upsert_maint").toString
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    def batchData(i: Int) = Seq(
      Ev(10L * i + 1, at(i), 100L + i % 3, "click", i.toDouble),
      Ev(10L * i + 2, at(i), 500L, "view", i * 2.0))
    val sOn = MemoryStream[Ev]; val sOff = MemoryStream[Ev]
    val qOn = Streams.upsertSink(sOn.toDF(), s"$dir/on", s"$dir/ckpt_on",
      snapshotEvery = 2, vacuumEvery = 2, keepN = 2)
    val qOff = Streams.upsertSink(sOff.toDF(), s"$dir/off", s"$dir/ckpt_off")
    def versionDirCount(t: String) =
      Option(new java.io.File(t).listFiles()).toSeq.flatten
        .count(_.getName.matches("[vd]\\d+"))
    try {
      (0 until 10).foreach { i =>
        sOn.addData(batchData(i)); qOn.processAllAvailable()
        sOff.addData(batchData(i)); qOff.processAllAvailable()
        // bounded MID-stream: ≤ keepN snapshots + (snapshotEvery−1)
        // deltas per retained cycle + the current cycle's tail
        assert(versionDirCount(s"$dir/on") <= 6,
          s"batch $i: ${versionDirCount(s"$dir/on")} version dirs")
      }
    } finally { qOn.stop(); qOff.stop() }
    assert(versionDirCount(s"$dir/off") == 10) // the unmaintained twin grew
    val read = (t: String) => Streams.readUpsertTable(spark, s"$dir/$t")
      .select("user_id", "event_id", "value")
      .as[(Long, Long, Double)].collect().toSet
    assert(read("on") == read("off") && read("on").nonEmpty)
  }

  test("streaming rolling min/max: ordered day-split replay ≡ the declared wide batch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the fixture event log replayed in global (ts, event_id) order,
    // split at the median ts — state (the last-63-values ring) must
    // carry across the batch boundary for every key
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[EvP].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val cut = ev(ev.length / 2).ts.getTime
    val stream = MemoryStream[EvP]
    val q = Streams.rollingMinMaxStream(spark, stream.toDF())
      .writeStream.format("memory").queryName("t_rollmm")
      .outputMode("append").start()
    try {
      stream.addData(ev.filter(_.ts.getTime < cut).toSeq); q.processAllAvailable()
      stream.addData(ev.filter(_.ts.getTime >= cut).toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_rollmm")
      .select("event_id", "roll_min", "roll_max")
      .as[(Long, Option[Double], Option[Double])].collect().toSet
    val want = graft.queries.Windows.windowRollingMinmaxWide(spark, sf)
      .select("event_id", "roll_min", "roll_max")
      .as[(Long, Option[Double], Option[Double])].collect().toSet
    assert(got == want && got.size == ev.length)
    // the frame gate bites both ways at this sf: some emissions are
    // defined (≥64-row keys exist), most are not
    assert(want.exists(_._2.isDefined) && want.exists(_._2.isEmpty))
  }

  test("sink maintenance under a held lock: cycle skipped loudly, stream keeps committing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // r18 review #3: a kill −9 during a previous cycle's vacuum leaves
    // a younger-than-TTL lock; the restarted sink must NOT crash-loop —
    // batches keep applying, retention skips until the lock clears
    val dir = java.nio.file.Files.createTempDirectory("upsert_lockskip").toString
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val s = MemoryStream[Ev]
    val q = Streams.upsertSink(s.toDF(), s"$dir/t", s"$dir/ckpt",
      snapshotEvery = 1, vacuumEvery = 1, keepN = 1)
    def nVersions = Option(new java.io.File(s"$dir/t").listFiles()).toSeq
      .flatten.count(_.getName.matches("[vd]\\d+"))
    try {
      s.addData(Seq(Ev(1, at(0), 1L, "click", 1.0))); q.processAllAvailable()
      // plant a foreign fresh lock (the crashed maintainer's leftover)
      val lock = new java.io.File(s"$dir/t/_maintenance.lock")
      assert(lock.createNewFile())
      s.addData(Seq(Ev(2, at(1), 1L, "click", 2.0))); q.processAllAvailable()
      // the batch COMMITTED (no crash loop) but vacuum was skipped:
      // both versions still on disk despite keepN=1
      assert(q.isActive, "stream died on the held maintenance lock")
      assert(nVersions == 2, s"expected skipped vacuum, $nVersions dirs")
      // lock clears → the next cadence vacuums back to keepN
      assert(lock.delete())
      s.addData(Seq(Ev(3, at(2), 1L, "click", 3.0))); q.processAllAvailable()
      assert(nVersions == 1, s"vacuum did not resume: $nVersions dirs")
    } finally q.stop()
    val got = Streams.readUpsertTable(spark, s"$dir/t")
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("streaming upsert sink: a replayed batchId is skipped (idempotence)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert_replay").toString
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val b0 = Seq(Ev(1, at(0), 100L, "click", 1.0)).toDF()
    val b1 = Seq(Ev(2, at(1), 100L, "click", 2.0)).toDF()
    Streams.applyUpsertBatch(b0, 0L, s"$dir/table")
    Streams.applyUpsertBatch(b1, 1L, s"$dir/table")
    val afterB1 = Streams.readUpsertTable(spark, s"$dir/table")
      .select("event_id").as[Long].collect().toSet
    // replay batch 0 (an at-least-once redelivery): must be a no-op,
    // NOT a regression of user 100 back to event 1
    Streams.applyUpsertBatch(b0, 0L, s"$dir/table")
    val afterReplay = Streams.readUpsertTable(spark, s"$dir/table")
      .select("event_id").as[Long].collect().toSet
    assert(afterB1 == Set(2L) && afterReplay == Set(2L))
  }

  test("upsert table: lost _current pointer — reader fails loud, writer replay repairs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert_crash").toString
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    Streams.applyUpsertBatch(
      Seq(Ev(1, at(0), 100L, "click", 1.0)).toDF(), 0L, s"$dir/table")
    Streams.applyUpsertBatch(
      Seq(Ev(2, at(1), 100L, "click", 2.0)).toDF(), 1L, s"$dir/table")
    // simulate a crash between the version write and the pointer flip
    // (or an object-store reader landing inside a non-atomic rename):
    // the pointer is gone, v0/v1 are complete on disk
    val ptr = new java.io.File(s"$dir/table/_current")
    assert(ptr.delete(), "fixture must start with a committed pointer")
    // the READER is fail-loud: without a pointer it cannot distinguish
    // "committed then lost" from "first batch still in flight", and
    // serving a never-committed state is the worse failure — recovery
    // is the writer's job
    val noPtr = intercept[IllegalStateException](
      Streams.readUpsertTable(spark, s"$dir/table").collect())
    // with complete version dirs on disk the message names the likely
    // in-flight pointer flip (round-12 advisory) instead of claiming
    // the table never committed
    assert(noPtr.getMessage.contains("2 committed version dir(s) exist"))
    assert(noPtr.getMessage.contains("retry"))
    // replaying the last batch repairs the pointer (the WRITER path
    // keeps the newest-complete-version fallback — anything it reads
    // it deterministically rewrites) instead of skipping
    Streams.applyUpsertBatch(
      Seq(Ev(2, at(1), 100L, "click", 2.0)).toDF(), 1L, s"$dir/table")
    assert(ptr.exists(), "replay must restore _current")
    val repaired = Streams.readUpsertTable(spark, s"$dir/table")
      .select("event_id").as[Long].collect().toSet
    assert(repaired == Set(2L))
  }

  test("upsert table time travel: versioned reads pin historical states") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert_tt").toString
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    Streams.applyUpsertBatch(
      Seq(Ev(1, at(0), 100L, "click", 1.0)).toDF(), 0L, s"$dir/table")
    Streams.applyUpsertBatch(
      Seq(Ev(2, at(1), 100L, "click", 2.0),
        Ev(3, at(2), 200L, "view", 3.0)).toDF(), 1L, s"$dir/table")
    val v0 = Streams.readUpsertTableVersion(spark, s"$dir/table", 0L)
      .select("event_id").as[Long].collect().toSet
    val v1 = Streams.readUpsertTableVersion(spark, s"$dir/table", 1L)
      .select("event_id").as[Long].collect().toSet
    assert(v0 == Set(1L) && v1 == Set(2L, 3L))
    val ex = intercept[IllegalArgumentException] {
      Streams.readUpsertTableVersion(spark, s"$dir/table", 7L)
    }
    assert(ex.getMessage.contains("v0, v1"))
  }

  test("streaming CDC apply sink: streamed batches equal a one-shot log fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_sink").toString
    val stream = MemoryStream[Chg]
    val q = Streams.cdcApplySink(
      stream.toDF(), s"$dir/table", s"$dir/ckpt", keys = Seq("k"))
    val b1 = Seq(Chg(1, 10.0, "A", 1, "I"), Chg(2, 20.0, "B", 1, "I"),
      Chg(3, 30.0, "C", 1, "I"), Chg(2, 21.0, "B", 2, "U"))
    // batch 2 exercises the cross-batch order: k=3 deleted then
    // re-inserted with a LATER seq — the sink must resurface the new
    // image, never the batch-1 one
    val b2 = Seq(Chg(3, 0.0, null, 3, "D"), Chg(1, 12.0, "A2", 4, "U"),
      Chg(3, 33.0, "C2", 5, "I"))
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = Streams.readUpsertTable(spark, s"$dir/table")
      .select("k", "v", "seg").as[(Long, Double, String)].collect().toSet
    assert(got == Set((1L, 12.0, "A2"), (2L, 21.0, "B"), (3L, 33.0, "C2")))
    // prefix-associativity: folding batch-by-batch ≡ folding the whole
    // log at once against an empty base
    val log = (b1 ++ b2).toDF()
    val oneShot = graft.operators.CdcApply
      .applyLog(log.select("k", "v", "seg").limit(0), log, keys = Seq("k"))
      .select("k", "v", "seg").as[(Long, Double, String)].collect().toSet
    assert(oneShot == got)
  }

  test("streaming last-touch attribution equals the batch query on an ordered replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // replay the fixture event log in global (ts, event_id) order —
    // order WITHIN a batch is immaterial (the state fn sorts), order
    // ACROSS batches is the documented in-order contract
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[EvP].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val stream = MemoryStream[EvP]
    val q = Streams.attributionLastTouch(spark, stream.toDF())
      .writeStream.format("memory").queryName("attr_hits")
      .outputMode("append").start()
    try {
      stream.addData(ev.take(ev.length / 2).toSeq); q.processAllAvailable()
      stream.addData(ev.drop(ev.length / 2).toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_hits").groupBy("item")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value").cast("decimal(38,8)")).cast("double"), 2)
          .as("revenue"))
      .orderBy("item").collect().toSeq
    val want = graft.queries.EventAnalytics.eventAttribution(spark, sf)
      .collect().toSeq
    assert(got == want)
  }

  test("streaming attribution: a late purchase older than the stored click credits organic") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val stream = MemoryStream[EvP]
    val q = Streams.attributionLastTouch(spark, stream.toDF())
      .writeStream.format("memory").queryName("attr_late")
      .outputMode("append").start()
    try {
      // batch 1: the user's only click, at 10:10
      stream.addData(Seq(EvP(10L, at(10), 7L, "click", 0.0, """{"k": 5}""")))
      q.processAllAvailable()
      // batch 2: a DELAYED purchase that actually happened at 10:05 —
      // crediting the 10:10 click would attribute to the future; the
      // batch twin credits organic, so must the stream
      stream.addData(Seq(EvP(11L, at(5), 7L, "purchase", 9.0, "{}")))
      q.processAllAvailable()
      // ...and a purchase genuinely after the click still credits it
      stream.addData(Seq(EvP(12L, at(20), 7L, "purchase", 4.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_late")
      .select("event_id", "item").as[(Long, Int)].collect().toMap
    assert(got == Map(11L -> -1, 12L -> 5))
  }

  test("CDC apply sink: a replayed batchId is skipped (idempotence)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc_replay").toString
    val b0 = Seq((1L, 10.0, 1L, "I"), (2L, 20.0, 2L, "I"))
      .toDF("k", "v", "seq", "op")
    val b1 = Seq((1L, 11.0, 3L, "U"), (2L, 0.0, 4L, "D"))
      .toDF("k", "v", "seq", "op")
    Streams.applyCdcBatch(b0, 0L, s"$dir/table", Seq("k"))
    Streams.applyCdcBatch(b1, 1L, s"$dir/table", Seq("k"))
    // at-least-once replay of an already-applied epoch: must be a
    // no-op — re-folding b0 on top of v1 would resurrect deleted k=2
    Streams.applyCdcBatch(b0, 0L, s"$dir/table", Seq("k"))
    val got = Streams.readUpsertTable(spark, s"$dir/table")
      .select("k", "v").as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 11.0)))
  }
}
