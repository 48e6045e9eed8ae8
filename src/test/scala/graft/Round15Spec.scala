package graft

import org.apache.spark.sql.functions._
import graft.queries.Windows

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
}
