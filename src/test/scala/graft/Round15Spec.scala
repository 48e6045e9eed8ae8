package graft

import org.apache.spark.sql.functions._
import graft.queries.{EventAnalytics, GraphOps, VectorOps, Windows}

/** Round-15 declared-query invariants against straight-line driver-side
  * references on the sf0.001 fixture (the Round14Spec discipline: same
  * inputs, naive Scala computation, exact equality — BigInt where the
  * query rides DECIMAL(38,0)).
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  /** Per-user (ts, event_id)-ordered cent values. */
  private def centSeries: Map[Long, Seq[(Long, Long)]] = {
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("user_id"), unix_micros(col("ts")).as("mu"), col("event_id"),
        round(col("value") * 100).cast("long").as("xc"))
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).map { case (u, rs) =>
      u -> rs.sortBy(r => (r._2, r._3)).map(r => (r._3, r._4)).toSeq
    }
  }

  test("window_rolling_kurt matches the naive bias-corrected kurtosis over each full 20-window") {
    val got = Windows.windowRollingKurt(spark, sf)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    val ref = centSeries.flatMap { case (_, s) =>
      s.zipWithIndex.map { case ((eid, _), i) =>
        val w = s.slice(i - 19, i + 1).map(_._2)
        val kt = if (i >= 19) {
          val n = 20L
          val s1 = w.sum; val s2 = w.map(x => x * x).sum
          val d2 = n * s2 - s1 * s1
          if (d2 > 0) {
            // the quartic sums ride BigInt exactly like the query's
            // DECIMAL(38,0) — int64 would wrap at this domain's x^4
            val bs1 = BigInt(s1)
            val s3 = w.map(x => BigInt(x) * x * x).sum
            val s4 = w.map(x => BigInt(x) * x * x * x).sum
            val d4 = BigInt(n * n * n * n) * s4 -
              BigInt(4 * n * n * n) * bs1 * s3 +
              BigInt(6 * n * n) * bs1 * bs1 * BigInt(s2) -
              BigInt(3 * n) * bs1 * bs1 * bs1 * bs1
            val dd = d2.toDouble
            val g = (399.0 * d4.toDouble / (20.0 * dd * dd) - 1083.0) / 306.0
            Some(BigDecimal(g).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble + 0.0)
          } else None
        } else None
        eid -> kt
      }
    }
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    assert(got.values.exists(_.isDefined), "fixture must exercise full windows")
  }

  test("window_drawdown equals the naive running peak / drawdown / max-drawdown") {
    val got = Windows.windowDrawdown(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    val ref = centSeries.flatMap { case (_, s) =>
      var peak = Long.MinValue; var mdd = Long.MinValue
      s.map { case (eid, x) =>
        peak = math.max(peak, x)
        val dd = peak - x
        mdd = math.max(mdd, dd)
        eid -> ((peak / 100.0, dd / 100.0, mdd / 100.0))
      }
    }
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    // non-vacuous: some drawdown must actually be positive
    assert(ref.values.exists(_._2 > 0))
  }

  test("window_rolling_quantile is the 18th smallest of each full 20-window") {
    val got = Windows.windowRollingQuantile(spark, sf)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    val ref = centSeries.flatMap { case (_, s) =>
      s.zipWithIndex.map { case ((eid, _), i) =>
        eid -> (if (i >= 19)
          Some(s.slice(i - 19, i + 1).map(_._2).sorted.apply(17) / 100.0)
        else None)
      }
    }
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    assert(got.values.exists(_.isDefined))
  }

  test("agg_gini / agg_mad match exact naive computations per segment") {
    val cust = graft.tables.Tables(spark, sf).customer
      .select(col("c_mktsegment"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
    val bySeg = cust.groupBy(_._1)

    val gini = graft.queries.Aggregations.aggGini(spark, sf)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    bySeg.foreach { case (seg, rs) =>
      // ascending (shifted-cents, custkey) total order; BigInt sums
      val xs = rs.map(r => (r._3 + 100000L, r._2)).sortBy(x => (x._1, x._2))
      val n = BigInt(xs.length)
      val sx = xs.map(x => BigInt(x._1)).sum
      val six = xs.zipWithIndex.map { case ((x, _), i) => BigInt(i + 1) * x }.sum
      val want = BigDecimal((BigInt(2) * six - (n + 1) * sx).toDouble /
        (n * sx).toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gini(seg)._1 == xs.length.toLong)
      assert(math.abs(gini(seg)._2 - want) < 1e-12, s"gini $seg")
    }

    val mad = graft.queries.Aggregations.aggMad(spark, sf)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    bySeg.foreach { case (seg, rs) =>
      def lowerMedian(v: Seq[Long]): Long = v.sorted.apply((v.length - 1) / 2)
      val m1 = lowerMedian(rs.map(_._3).toSeq)
      val want = lowerMedian(rs.map(r => math.abs(r._3 - m1)).toSeq) / 100.0
      assert(mad(seg) == want, s"mad $seg")
    }
  }

  test("sample_weighted picks the same deterministic A-Res top-100 as naive Scala") {
    val cust = graft.tables.Tables(spark, sf).customer
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long"))
      .as[(Long, Long)].collect()
    val keyed = cust.map { case (k, cents) =>
      val mix = java.lang.Math.floorMod(k * 2654435761L, 2147483648L)
      val u = (mix + 1).toDouble / 2147483648.0
      val w = (cents + 100000L).toDouble
      val ares = BigDecimal(math.pow(u, 1.0 / w))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      (k, ares)
    }
    val want = keyed.sortBy { case (k, a) => (-a, k) }.take(100).map(_._1).toSeq
    val got = graft.queries.TrainPrep.sampleWeighted(spark, sf)
      .select("c_custkey").as[Long].collect().toSeq
    assert(got == want, "A-Res selection diverged from the naive reference")
  }

  private def centSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Seq[Long])] =
    df.select(col("cid"), col("n"), col("cvec"))
      .as[(Long, Long, Seq[Long])].collect().toSet

  test("kmeans to fixpoint: equals unrolled at run depth, caps honestly, releases storage") {
    import org.apache.spark.sql.graft.Checkpoints
    import graft.queries.VectorOps
    val e = graft.tables.Tables(spark, sf).embeddings
    val before = spark.sparkContext.getPersistentRDDs.keySet

    // capped run: one round exactly equals the statically-unrolled form
    // at depth 1, and (seeds being raw points) cannot have converged
    val (c1, r1, conv1) = VectorOps.kmeansToFixpoint(e, maxRounds = 1)
    assert(r1 == 1 && !conv1)
    assert(centSet(c1) == centSet(VectorOps.kmeansCentroids(e, 8, 1)))
    Checkpoints.release(c1)

    // a jitter-sized tolerance (one lattice unit per dimension) must
    // converge on this fixture well before the cap; the converged table
    // equals the unrolled chain replayed at the SAME depth, and one
    // more unrolled round moves every surviving centroid by <= tol
    val (cf, rf, convf) = VectorOps.kmeansToFixpoint(e,
      maxRounds = 40, toleranceUnits = 64L)
    assert(convf, s"no convergence in 40 rounds")
    assert(rf < 40)
    val fix = centSet(cf)
    assert(fix == centSet(VectorOps.kmeansCentroids(e, 8, rf)),
      "converged loop diverged from the unrolled form")
    val oneMore = centSet(VectorOps.kmeansCentroids(e, 8, rf + 1))
      .map(c => c._1 -> c._3).toMap
    val drift = fix.toSeq.map { case (cid, _, v) =>
      oneMore.get(cid).map(nv => v.zip(nv).map { case (a, b) => (a - b).abs }.sum)
        .getOrElse(Long.MaxValue)
    }.sum
    assert(drift <= 64L, s"stability window exceeded the tolerance: $drift")
    Checkpoints.release(cf)

    // checkpoint hygiene: corpus + per-round centroid blocks all freed
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked blocks: $leaked")
  }

  test("window_rolling_prod compounds the exact 4-lag basis-point lattice") {
    val got = Windows.windowRollingProd(spark, sf)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    val ref = centSeries.flatMap { case (_, s) =>
      val fs = s.map { case (eid, xc) =>
        (eid, 10000L + java.lang.Math.floorMod(xc, 201L) - 100L)
      }
      fs.zipWithIndex.map { case ((eid, _), i) =>
        eid -> (if (i >= 3) {
          val p = fs.slice(i - 3, i + 1).map(_._2).product
          Some(BigDecimal(p.toDouble / 1e16)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
        } else None)
      }
    }
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    assert(got.values.exists(_.isDefined))
  }

  test("window_rolling_rank is 1 + strictly-below count in each full 6-window") {
    val got = Windows.windowRollingRank(spark, sf)
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._3).toMap
    val ref = centSeries.flatMap { case (_, s) =>
      s.zipWithIndex.map { case ((eid, xc), i) =>
        eid -> (if (i >= 5)
          Some(1L + s.slice(i - 5, i).map(_._2).count(_ < xc))
        else None)
      }
    }
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    // the fixture must exercise non-trivial ranks (not all 1 / all 6)
    assert(got.values.flatten.toSet.size > 2)
  }

  test("window_rolling_nunique is the distinct count of each full 4-window") {
    val got = Windows.windowRollingNunique(spark, sf)
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._3).toMap
    val ref = centSeries.flatMap { case (_, s) =>
      val ds = s.map { case (eid, xc) =>
        (eid, java.lang.Math.floorMod(xc, 5L)) }
      ds.zipWithIndex.map { case ((eid, _), i) =>
        eid -> (if (i >= 3)
          Some(ds.slice(i - 3, i + 1).map(_._2).distinct.size.toLong)
        else None)
      }
    }
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    // domain 5 over window 4 must produce collisions AND full-distinct
    val vals = got.values.flatten.toSet
    assert(vals.contains(4L) && vals.exists(_ < 4L))
  }

  test("graph_resource_alloc equals the naive RA index over the naive co-purchase graph") {
    val po = graft.tables.Tables(spark, sf).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    po.groupBy(_._1).foreach { case (_, rows) =>
      val parts = rows.map(_._2).distinct
      for (a <- parts; b <- parts if a != b)
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
    }
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    val score = scala.collection.mutable.Map.empty[(Long, Long), Long]
    val common = scala.collection.mutable.Map.empty[(Long, Long), Long]
    adj.foreach { case (c, nbrs) =>
      val ns = nbrs.toSeq.sorted
      val ppb = 1000000000L / deg(c)
      for (i <- ns.indices; j <- (i + 1) until ns.size) {
        val key = (ns(i), ns(j))
        score(key) = score.getOrElse(key, 0L) + ppb
        common(key) = common.getOrElse(key, 0L) + 1L
      }
    }
    val nonAdjacent = score.keys.filterNot { case (a, b) => adj(a).contains(b) }
    // the declared query's candidate floor (n_common >= 2, in both
    // engines' SQL) applies to the reference too
    val refTop = nonAdjacent.toSeq.filter(k => common(k) >= 2L)
      .map(k => (k._1, k._2, score(k), common(k)))
      .sortBy { case (a, b, s, _) => (-s, a, b) }.take(50)
    val got = GraphOps.graphResourceAlloc(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == refTop)
    assert(refTop.nonEmpty && refTop.head._3 > 0)
  }

  test("assoc_rules_lift matches naive capped-basket counting") {
    import org.apache.spark.sql.functions.get_json_object
    val rows = graft.tables.Tables(spark, sf).events
      .filter(col("event_type") === "view")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull)
      .as[(Long, Int)].collect().toSeq.distinct
    val baskets = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.take(16)).toMap
    val nUsers = baskets.size.toLong
    val sup = baskets.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val pairCount = scala.collection.mutable.Map.empty[(Int, Int), Long]
    baskets.values.foreach { items =>
      for (i <- items.indices; j <- (i + 1) until items.size)
        pairCount((items(i), items(j))) =
          pairCount.getOrElse((items(i), items(j)), 0L) + 1L
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // support floor 2: sf0.001's max pair support is 2, so the declared
    // floor (3) would compare empty-to-empty — the parameterized form
    // keeps the ratio arithmetic under real test here
    val ref = pairCount.toSeq.filter(_._2 >= 2L).map { case ((a, b), nab) =>
      val (na, nb) = (sup(a), sup(b))
      (a, b, nab, na, nb, r6(nab.toDouble / na.toDouble),
        r6(nab.toDouble / nb.toDouble),
        r6((nab * nUsers).toDouble / (na * nb).toDouble))
    }.sortBy { case (a, b, _, _, _, _, _, l) => (-l, a, b) }.take(30)
    val got = EventAnalytics.assocRules(spark, sf, minSupport = 2)
      .as[(Int, Int, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == ref)
    assert(ref.nonEmpty && ref.exists(_._8 > 1.0), "fixture must show lift > 1")
  }

  test("seg_rfm: quintile fences partition every segment's customers and masses add up") {
    val t = graft.tables.Tables(spark, sf)
    val percust = t.orders
      .join(t.customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("mon_c"))
      .as[(String, Long, Long, Long)].collect()
    val got = EventAnalytics.segRfm(spark, sf)
      .as[(String, Int, Int, Int, Long, Double)].collect()
    // every scored customer lands in exactly one cell
    assert(got.map(_._5).sum == percust.length)
    // total monetary mass is conserved exactly
    val totalCents = percust.map(_._4).sum
    assert(BigDecimal(got.map(_._6).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP) ==
      BigDecimal(totalCents) / 100)
    // scores live in 1..5 and every segment uses the full monetary range
    assert(got.forall(r => r._2 >= 1 && r._2 <= 5 && r._3 >= 1 && r._3 <= 5 &&
      r._4 >= 1 && r._4 <= 5))
    val segs = got.groupBy(_._1)
    assert(segs.forall { case (_, cells) =>
      cells.exists(_._4 == 1) && cells.exists(_._4 == 5) })
  }

  test("ts_dod_change matches the naive calendar-guarded day-over-day change") {
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"),
        round(col("value") * 100).cast("long").as("xc"))
      .as[(Long, String, Long)].collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ref = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val daily = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      daily.zipWithIndex.map { case ((day, cents), i) =>
        val prev = if (i == 0) None else Some(daily(i - 1))
        val dod = prev.flatMap { case (pd, pc) =>
          val d1 = java.time.LocalDate.parse(day)
          val d0 = java.time.LocalDate.parse(pd)
          if (d0.plusDays(1) == d1 && pc != 0L)
            Some(r6((cents - pc).toDouble / pc.toDouble) + 0.0)
          else None
        }
        (u, day) -> ((cents / 100.0, dod))
      }
    }
    val got = Windows.tsDodChange(spark, sf)
      .as[(Long, String, Double, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.size == ref.size)
    ref.foreach { case (k, v) => assert(got(k) == v, s"key $k") }
    // the fixture must exercise BOTH a consecutive-day change and a gap
    assert(ref.values.exists(_._2.isDefined))
    assert(ref.values.exists(_._2.isEmpty))
  }

  test("window_expanding_corr matches the naive exact-co-moment prefix correlation") {
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        round(col("value") * 100).cast("long").as("xc"),
        (col("event_id") % 97).as("y"))
      .as[(Long, Long, Long, Long, Long)].collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ref = rows.groupBy(_._1).flatMap { case (_, rs) =>
      val s = rs.toSeq.sortBy(r => (r._2, r._3))
      var (n, sx, sy, sxx, syy, sxy) = (0L, 0L, 0L, 0L, 0L, 0L)
      s.map { case (_, _, eid, xc, y) =>
        n += 1; sx += xc; sy += y; sxx += xc * xc; syy += y * y; sxy += xc * y
        val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
        eid -> (if (n >= 2 && dx > 0 && dy > 0)
          Some(r6((n * sxy - sx * sy).toDouble /
            (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble))) + 0.0)
        else None)
      }
    }
    val got = Windows.windowExpandingCorr(spark, sf)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    assert(ref.values.flatten.nonEmpty)
  }

  test("window_ewm_var matches the naive reliability-weighted sample variance") {
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the query's exact-lattice semantics: every weighted product is
    // quantized to 6 decimals BEFORE summation, and each exact decimal
    // sum re-enters double via the scaled-BIGINT path
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def toD(s: BigDecimal) = (s * 1000000).toBigInt.toDouble / 1e6
    val ref = rows.groupBy(_._1).flatMap { case (_, rs) =>
      val s = rs.toSeq.sortBy(r => (r._2, r._3))
      var (sw, sww, sx, sxx) =
        (BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0))
      s.zipWithIndex.map { case ((_, _, eid, v), i) =>
        val w = math.pow(0.9, -i.toDouble)
        sw += q6(w); sww += q6(w * w); sx += q6(v * w); sxx += q6(v * v * w)
        val (dw, dww, dx, dxx) = (toD(sw), toD(sww), toD(sx), toD(sxx))
        val den = dw * dw - dww
        eid -> (if (den > 0) Some(r4((dw * dxx - dx * dx) / den) + 0.0) else None)
      }
    }
    val got = Windows.windowEwmVar(spark, sf)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    assert(ref.values.flatten.exists(_ > 0))
  }

  test("dq_schema_drift: profile arithmetic and the planted drift both surface") {
    import graft.queries.TrainPrep
    val got = TrainPrep.dqSchemaDrift(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 5)
    // naive profile of the before side
    val cust = graft.tables.Tables(spark, sf).customer
      .as[(Long, String, Int, Double, String)].collect()
    val nA = cust.length.toLong
    got.values.foreach { r =>
      assert(r._2 == nA)
      assert(r._8 == r._5 - r._4, s"delta mismatch for ${r._1}")
    }
    assert(got("c_custkey")._6 == cust.map(_._1).distinct.length.toLong)
    assert(got("c_mktsegment")._6 == cust.map(_._5).distinct.length.toLong)
    // before side has no nulls; the planted %19 feed failure must show
    assert(got.values.forall(_._4 == 0L))
    assert(got("c_acctbal")._5 > 0L && got("c_acctbal")._8 > 0L,
      "planted null drift not surfaced")
    // rows_after = |%13 survivors| + |%17 clones|
    val expectedB = cust.count(_._1 % 13 != 0).toLong + cust.count(_._1 % 17 == 0).toLong
    assert(got.values.forall(_._3 == expectedB))
  }

  test("window_rolling_idxmax finds the EARLIEST max of each full 20-window") {
    val got = Windows.windowRollingIdxmax(spark, sf)
      .as[(Long, Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    val ref = centSeries.flatMap { case (_, s) =>
      s.zipWithIndex.map { case ((eid, _), i) =>
        eid -> (if (i >= 19) {
          val w = s.slice(i - 19, i + 1)
          val mx = w.map(_._2).max
          // first-max rule: the earliest event carrying the max cents
          (Some(w.find(_._2 == mx).get._1), Some(mx / 100.0))
        } else (None, None))
      }
    }
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    assert(got.values.exists(_._1.isDefined))
  }

  test("ts_seasonal_anomaly scores against the naive per-cell profile") {
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("event_id"), col("event_type"), dayofweek(col("ts")),
        hour(col("ts")), round(col("value") * 100).cast("long"))
      .as[(Long, String, Int, Int, Long)].collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scored = rows.groupBy(r => (r._2, r._4)).toSeq.flatMap {
      case (_, cell) =>
        val n = cell.length.toLong
        val s1 = cell.map(_._5).sum
        val s2 = cell.map(x => x._5 * x._5).sum
        val den = n * s2 - s1 * s1
        if (n >= 2 && den > 0) cell.map { r =>
          val z = r6((n * r._5 - s1).toDouble /
            (math.sqrt(den.toDouble) * math.sqrt(n.toDouble) /
              math.sqrt((n - 1).toDouble)))
          (r._1, z)
        } else Seq.empty
    }
    // gate 2.0 over hour-only cells: sf0.001's hour-of-week cells hold
    // ~1 event (a 2-row cell's |z| tops out at 1/sqrt(2)), so the
    // parameterized form keeps scoring and ranking under real test
    val refTop = scored.filter(r => math.abs(r._2) > 2.0)
      .sortBy(r => (-math.abs(r._2), r._1)).take(50)
    val got = Windows.seasonalAnomalies(spark, sf, threshold = 2.0, byDow = false)
      .select(col("event_id"), col("z")).as[(Long, Double)].collect().toSeq
    assert(got == refTop)
    assert(refTop.nonEmpty, "fixture must contain 2-sigma seasonal outliers")
  }

  test("agg_weighted_mean / agg_string_join match naive computations") {
    import graft.queries.Aggregations
    val li = graft.tables.Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wantWm = li.groupBy(_._1).view.mapValues { rs =>
      val sw = rs.map(_._2).sum
      val swx = rs.map(r => BigInt(r._2) * r._3).sum
      (sw, r4(swx.toDouble / sw.toDouble / 100.0))
    }.toMap
    Aggregations.aggWeightedMean(spark, sf)
      .as[(String, Long, Double)].collect().foreach { r =>
        assert((r._2, r._3) == wantWm(r._1), s"flag ${r._1}")
      }

    val cust = graft.tables.Tables(spark, sf).customer
      .select(col("c_mktsegment"), col("c_custkey"), col("c_name"))
      .as[(String, Long, String)].collect()
    val wantSj = cust.groupBy(_._1).view.mapValues { rs =>
      val five = rs.sortBy(_._2).take(5).map(_._3).sorted
      (five.length.toLong, five.mkString("|"))
    }.toMap
    Aggregations.aggStringJoin(spark, sf)
      .as[(String, Long, String)].collect().foreach { r =>
        assert((r._2, r._3) == wantSj(r._1), s"segment ${r._1}")
      }
  }

  test("scalar_variant: one-parse variant probes equal the per-field JSON reads") {
    import graft.queries.Scalars
    val got = Scalars.scalarVariant(spark, sf)
      .as[(Long, Option[Long], Option[String], Boolean, Option[Long])].collect()
    val ref = graft.tables.Tables(spark, sf).events
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got.length == ref.size)
    got.foreach { case (eid, k, kStr, missNull, bucket) =>
      assert(k == ref(eid), s"event $eid")
      assert(kStr == k.map(_.toString))
      assert(missNull, s"event $eid: absent path must read as null")
      assert(bucket == k.map(x => java.lang.Math.floorMod(x, 5L)))
    }
    assert(got.exists(_._2.isDefined))
  }

  test("scalar_rowwise_stats equals the naive per-row sort of the four cent columns") {
    import graft.queries.Scalars
    val rows = graft.tables.Tables(spark, sf).lineitem
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity") * 100).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_tax") * 100).cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val ref = rows.map { r =>
      val s = Seq(r._3, r._4, r._5, r._6).sorted
      (r._1, r._2, s(0) / 100.0, s(1) / 100.0, s(3) / 100.0)
    }.sortBy(r => (r._1, r._2, r._3, r._4, r._5)).toSeq
    val got = Scalars.scalarRowwiseStats(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == ref)
  }

  test("agg_ab_ttest / agg_chisq_independence match naive exact-moment statistics") {
    import graft.queries.Aggregations
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("event_type"), col("user_id"), dayofweek(col("ts")).cast("long"),
        round(col("value") * 100).cast("long"))
      .as[(String, Long, Long, Long)].collect()
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val wantT = rows.groupBy(_._1).view.mapValues { rs =>
      def stats(p: ((String, Long, Long, Long)) => Boolean) = {
        val xs = rs.filter(p).map(_._4)
        (xs.length.toLong, xs.sum, xs.map(x => BigInt(x) * x).sum)
      }
      val (nt, s1t, s2t) = stats(_._2 % 2 == 0)
      val (nc, s1c, s2c) = stats(_._2 % 2 != 0)
      def mean(n: Long, s1: Long) = s1.toDouble / n.toDouble / 100.0
      def vOverN(n: Long, s1: Long, s2: BigInt) =
        (BigInt(n) * s2 - BigInt(s1) * BigInt(s1)).toDouble /
          ((n * (n - 1)).toDouble * 10000.0) / n.toDouble
      (nt, nc, r4(mean(nt, s1t) - mean(nc, s1c)),
        r4((mean(nt, s1t) - mean(nc, s1c)) /
          math.sqrt(vOverN(nt, s1t, s2t) + vOverN(nc, s1c, s2c))))
    }.toMap
    Aggregations.aggAbTtest(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect().foreach { r =>
        assert((r._2, r._3, r._4, r._5) == wantT(r._1), s"type ${r._1}")
      }

    val n = rows.length.toLong
    val cells = rows.groupBy(r => (r._1, r._3)).view.mapValues(_.length.toLong)
    val rm = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cm = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val wantChi = cells.toSeq.groupBy(_._1._1).view.mapValues { cs =>
      val sum = cs.map { case ((t, d), o) =>
        val num = BigInt(o * n - rm(t) * cm(d))
        BigDecimal(r6((num * num).toDouble / (BigInt(rm(t)) * BigInt(cm(d))).toDouble / n.toDouble))
      }.sum
      (cs.length.toLong, ((sum * 1000000).toBigInt.toDouble / 1e6))
    }.toMap
    Aggregations.aggChisqIndependence(spark, sf)
      .as[(String, Long, Double)].collect().foreach { r =>
        assert((r._2, r._3) == wantChi(r._1), s"type ${r._1}")
      }
    assert(wantChi.values.exists(_._2 > 0))
  }

  test("mix_epoch_schedule: integer schedule identities and budget conservation") {
    import graft.queries.TrainPrep
    val got = TrainPrep.mixEpochSchedule(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    got.foreach { case (src, _, tok, target, ep, ppm) =>
      assert(ep == target / tok, s"$src epochs")
      assert(ppm == (target % tok) * 1000000L / tok, s"$src ppm")
      assert(ppm >= 0 && ppm < 1000000L)
    }
    // floor() drops < 1 token per source: the schedule's total target
    // reconstructs the 10M budget to within |sources| tokens
    val sumTarget = got.map(_._4).sum
    assert(sumTarget <= 10000000L && sumTarget > 10000000L - got.length,
      s"budget drift: $sumTarget")
    // non-vacuous: a full epoch somewhere AND a fractional remainder
    // somewhere (sf0.001's tiny sources all win >=1 epoch, so a
    // partial-ONLY source can't be demanded at this fixture)
    assert(got.exists(_._5 >= 1) && got.exists(_._6 > 0))
  }

  test("agg_anova_f equals the naive one-way F over exact group moments") {
    import graft.queries.Aggregations
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect()
    val per = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      (t, rs.length.toLong, rs.map(_._2).sum,
        rs.map(x => BigInt(x._2) * x._2).sum)
    }
    val k = per.length.toLong
    val n = per.map(_._2).sum
    val gs1 = per.map(x => BigInt(x._3)).sum
    val gs2 = per.map(_._4).sum
    // the query's sorted-fold order: struct sort is by event_type
    var ssq = 0.0
    per.foreach { case (_, ng, s1, _) =>
      ssq += s1.toDouble * s1.toDouble / ng.toDouble }
    val f = ((ssq - gs1.toDouble * gs1.toDouble / n.toDouble) / (k - 1).toDouble) /
      ((gs2.toDouble - ssq) / (n - k).toDouble)
    val want = BigDecimal(f).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Aggregations.aggAnovaF(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 1)
    assert(got(0) == ((k, n, want)))
    assert(want > 0)
  }

  test("ts_seasonal_decompose: trend + seasonal + residual reconstruct each full-window day") {
    val got = Windows.tsSeasonalDecompose(spark, sf)
      .as[(Long, String, Double, Option[Double], Double, Option[Double])]
      .collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // naive replay: per-user daily cents, positional 7-row centered
    // window, det7 = 7x - sum7, dow means over all full windows
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("user_id"), to_date(col("ts")).cast("string"),
        round(col("value") * 100).cast("long"))
      .as[(Long, String, Long)].collect()
    val daily = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val series = daily.keys.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    val det = scala.collection.mutable.Map.empty[(Long, String), Long]
    val win = scala.collection.mutable.Map.empty[(Long, String), (Long, Long)]
    series.foreach { case (u, days) =>
      days.zipWithIndex.foreach { case (d, i) =>
        val lo = math.max(0, i - 3); val hi = math.min(days.size - 1, i + 3)
        val w = (lo to hi).map(j => daily((u, days(j))))
        win((u, d)) = (w.size.toLong, w.sum)
        if (i >= 3 && i + 3 < days.size)
          det((u, d)) = 7L * daily((u, d)) - w.sum
      }
    }
    val dowOf = det.keys.map { k =>
      k -> (java.time.LocalDate.parse(k._2).getDayOfWeek.getValue % 7 + 1)
    }.toMap
    val seas = det.groupBy(k => dowOf(k._1)).view.mapValues { m =>
      (m.size.toLong, m.values.sum) }.toMap
    got.foreach { case (u, d, total, trend, seasonal, resid) =>
      val x = daily((u, d))
      assert(total == x / 100.0)
      val dow = java.time.LocalDate.parse(d).getDayOfWeek.getValue % 7 + 1
      val (sn, ss) = seas(dow)
      assert(seasonal == r6(ss.toDouble / (7.0 * sn.toDouble) / 100.0), s"$u $d")
      det.get((u, d)) match {
        case Some(_) =>
          val ws = win((u, d))._2
          assert(trend == Some(r6(ws.toDouble / 700.0) + 0.0), s"$u $d trend")
          assert(resid == Some(r6((x.toDouble - ws.toDouble / 7.0 -
            ss.toDouble / (7.0 * sn.toDouble)) / 100.0) + 0.0), s"$u $d resid")
        case None =>
          assert(trend.isEmpty && resid.isEmpty, s"$u $d should be edge")
      }
    }
    assert(got.exists(_._4.isDefined) && got.exists(_._4.isEmpty))
  }

  test("ts_cusum_alarm: the prefix-minus-running-min closed form equals Page's recursion") {
    val got = Windows.tsCusumAlarm(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    val ref = centSeries.flatMap { case (_, s) =>
      val n = s.length.toLong
      val sx = s.map(_._2).sum
      // the textbook recursion, on the same n-scaled integer lattice:
      // S_t = max(0, S_{t-1} + (n·x − Σx − n·k))
      var st = 0L
      s.map { case (eid, x) =>
        st = math.max(0L, st + (n * x - sx - n * 50L))
        val e6 = (BigInt(st) * 2000000 + BigInt(n * 100)) / (BigInt(2) * n * 100)
        eid -> ((e6.toLong, st > n * 500L))
      }
    }
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    // the fixture must raise AND clear alarms
    assert(ref.values.exists(_._2) && ref.values.exists(!_._2))
  }

  test("rag_fusion_rrf: fused scores decompose into the two arms' reciprocal ranks") {
    val got = VectorOps.ragFusionRrf(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 15)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (doc, rl, rs, rrf) =>
      assert(rl >= 0 && rl <= 20 && rs >= 0 && rs <= 20)
      assert(rl > 0 || rs > 0, s"doc $doc in neither top-20")
      val expect = r6((if (rl > 0) 1.0 / (60 + rl) else 0.0) +
        (if (rs > 0) 1.0 / (60 + rs) else 0.0))
      assert(rrf == expect, s"doc $doc")
    }
    // descending fused order with doc tiebreak
    val pairs = got.map(r => (-r._4, r._1)).toSeq
    assert(pairs == pairs.sorted)
    // the whole point of fusion: at least one doc present in BOTH lists
    assert(got.exists(r => r._2 > 0 && r._3 > 0))
  }
}
