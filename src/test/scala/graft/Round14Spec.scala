package graft

import org.apache.spark.sql.functions._
import graft.queries.{Aggregations, Joins, TrainPrep, VectorOps, Windows}

/** Round-14 declared-query invariants, each pinned against a
  * straight-line driver-side reference on the sf0.001 fixture (the
  * PropertySpec discipline: same inputs, naive Scala computation,
  * exact equality).
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- WMA
  test("window_rolling_wma matches a naive 4/3/2/1 lag fold, null under min_periods") {
    val got = Windows.windowRollingWma(spark, sf)
      .select("event_id", "user_id", "wma")
      .as[(Long, Long, Option[Double])].collect()
    val events = graft.tables.Tables(spark, sf).events
      .select(col("user_id"), col("ts").cast("long").as("t"), col("event_id"),
        round(col("value") * 100).cast("long").as("xc"))
      .as[(Long, Long, Long, Long)].collect()
    val ref = events.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      val ord = rows.sortBy(r => (r._2, r._3))
      ord.zipWithIndex.map { case (r, i) =>
        val w = if (i >= 3)
          Some((ord(i)._4 * 4 + ord(i - 1)._4 * 3 + ord(i - 2)._4 * 2 +
            ord(i - 3)._4).toDouble / 1000.0)
        else None
        r._3 -> w
      }
    }.toMap
    assert(got.length == events.length)
    got.foreach { case (eid, _, wma) => assert(wma == ref(eid), s"event $eid") }
  }

  // ------------------------------------------------------------ TWAP
  test("ts_time_weighted_avg is the exact step-function integral; ties carry zero; single-event users absent") {
    val got = Windows.tsTimeWeightedAvg(spark, sf)
      .as[(Long, Double)].collect().toMap
    val events = graft.tables.Tables(spark, sf).events
      .select(col("user_id"), unix_micros(col("ts")).as("mu"), col("event_id"),
        round(col("value") * 100).cast("long").as("xc"))
      .as[(Long, Long, Long, Long)].collect()
    val ref = events.groupBy(_._1).iterator.flatMap { case (u, rows) =>
      val ord = rows.sortBy(r => (r._2, r._3)).toSeq
      val terms = ord.zip(ord.drop(1)).map { case (a, b) => (a._4, b._2 - a._2) }
      val den = terms.map(_._2).sum
      if (den > 0)
        Some(u -> terms.map(t => t._1 * t._2).sum.toDouble / (den * 100).toDouble)
      else None
    }.toMap
    assert(got == ref)
    // constant-value users integrate to that value exactly
    got.foreach { case (u, tw) =>
      val vals = events.filter(_._1 == u).map(_._4)
      if (vals.distinct.length == 1)
        assert(tw == vals.head.toDouble / 100.0)
    }
  }

  // ------------------------------------------------------- factorize
  test("encode_label_factorize codes are dense, sorted-order, and cover the domain") {
    val out = TrainPrep.encodeLabelFactorize(spark, sf)
    val typeCodes = out.select("p_type", "type_code").distinct()
      .as[(String, Long)].collect().sortBy(_._1)
    // dense 0..n-1 in sorted domain order
    assert(typeCodes.map(_._2).toSeq == typeCodes.indices.map(_.toLong))
    val brandCodes = out.select("p_brand", "brand_code").distinct()
      .as[(String, Long)].collect().sortBy(_._1)
    assert(brandCodes.map(_._2).toSeq == brandCodes.indices.map(_.toLong))
    // row set is the part table exactly (the join loses/creates nothing)
    val parts = spark.read.parquet(s"$sf/part.parquet").count()
    assert(out.count() == parts)
  }

  // ---------------------------------------------------------- idxmax
  test("agg_idxmax picks the max value's row, ties to the SMALLEST event_id") {
    val got = Aggregations.aggIdxmax(spark, sf)
      .as[(Long, Long, Double)].collect()
    val events = graft.tables.Tables(spark, sf).events
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("xc"))
      .as[(Long, Long, Long)].collect()
    val ref = events.groupBy(_._1).map { case (u, rows) =>
      val mx = rows.map(_._3).max
      u -> (rows.filter(_._3 == mx).map(_._2).min, mx.toDouble / 100.0)
    }
    assert(got.map(r => r._1 -> ((r._2, r._3))).toMap == ref)
    // explicit tie exercise on a literal frame through the same plan
    val tied = Seq((1L, 10L, 5.0), (1L, 3L, 5.0), (1L, 7L, 1.0))
      .toDF("user_id", "event_id", "value")
    val xc = round(col("value") * 100).cast("long")
    val t = tied.select(col("user_id"),
        struct(xc.as("xc"), (-col("event_id")).as("neg")).as("p"))
      .groupBy("user_id").agg(max(col("p")).as("m"))
      .select(col("user_id"), (-col("m.neg")).as("idx"))
      .as[(Long, Long)].head()
    assert(t == ((1L, 3L)))
  }

  // ---------------------------------------------------------- kmeans
  test("vec_kmeans_lloyd equals a straight-line integer-lattice Lloyd reference") {
    val got = VectorOps.vecKmeansLloyd(spark, sf)
      .as[(Long, Long, Int, Double)].collect()
      .map(r => (r._1, r._3) -> ((r._2, r._4))).toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val q = vecs.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * 1e6).toLong + 4000000L)
    }
    var cent: Map[Long, Array[Long]] =
      q.take(8).zipWithIndex.map { case ((_, v), i) => i.toLong -> v }.toMap
    var sizes: Map[Long, Long] = Map.empty
    for (_ <- 1 to 3) {
      val assigned = q.map { case (id, v) =>
        val best = cent.toSeq.map { case (cid, c) =>
          (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }.min
        (best._2, v)
      }
      val byC = assigned.groupBy(_._1)
      sizes = byC.map { case (cid, vs) => cid -> vs.length.toLong }
      cent = byC.map { case (cid, vs) =>
        val n = vs.length
        cid -> Array.tabulate(64)(d =>
          Math.floorDiv(vs.map(_._2(d)).sum, n.toLong))
      }
    }
    val ref = (for ((cid, c) <- cent.toSeq; d <- 0 until 64) yield
      (cid, d + 1) -> ((sizes(cid), (c(d) - 4000000L).toDouble / 1e6))).toMap
    assert(got == ref)
    assert(got.keys.map(_._1).toSet.size == 8, "no cluster emptied")
  }

  // -------------------------------------------------------------- ER
  test("er_fuzzy_entities equals union-find over the fuzzy pair graph; labels are min members") {
    val got = Joins.erFuzzyEntities(spark, sf)
      .as[(String, String, Long)].collect()
    val names = spark.read.parquet(s"$sf/part.parquet")
      .select("p_name").distinct().as[String].collect()
    val pairs = graft.operators.FuzzyJoin
      .levenshteinSelfJoin(spark.read.parquet(s"$sf/part.parquet"), "p_name", 2)
      .select("a", "b").as[(String, String)].collect()
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val lbl = names.map(n => n -> find(n)).toMap
    val counts = lbl.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ref = names.map(n => (n, lbl(n), counts(lbl(n)))).toSet
    assert(got.toSet == ref)
    // every entity label is itself a member and the min of its members
    got.groupBy(_._2).foreach { case (e, members) =>
      assert(members.map(_._1).min == e)
    }
  }

  // ------------------------------------------------------ group OLS
  test("agg_group_ols equals an exact-moment naive least-squares per group") {
    val got = Aggregations.aggGroupOls(spark, sf)
      .as[(String, String, Long, Double, Double)].collect()
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, String, Long, Long)].collect()
    val ref = rows.groupBy(r => (r._1, r._2)).map { case ((rf, ls), g) =>
      val n = BigInt(g.length)
      val sx = g.map(r => BigInt(r._3)).sum
      val sy = g.map(r => BigInt(r._4)).sum
      val sxy = g.map(r => BigInt(r._3) * BigInt(r._4)).sum
      val sxx = g.map(r => BigInt(r._3) * BigInt(r._3)).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val xbar = sx.toDouble / n.toDouble
      val ybar = sy.toDouble / n.toDouble
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (rf, ls) -> ((g.length.toLong, r6(slope / 100.0),
        r6((ybar - slope * xbar) / 100.0)))
    }
    assert(got.length == ref.size)
    got.foreach { case (rf, ls, n, sl, ic) =>
      assert((n, sl, ic) == ref((rf, ls)), s"group ($rf,$ls)")
    }
  }

  // ------------------------------------------------------------ BM25
  test("text_bm25_topk equals a naive corpus-wide BM25 ranking") {
    val got = TrainPrep.textBm25Topk(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val terms = Seq("vector", "hash", "window")
    val per = docs.map { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (id, toks.length.toLong, terms.map(t => toks.count(_ == t).toLong))
    }
    val nd = per.length.toLong
    val sdl = per.map(_._2).sum
    val dfs = terms.indices.map(i => per.count(_._3(i) > 0).toLong)
    def score(dl: Long, tfs: Seq[Long]): Double = {
      val z = (dl * nd).toDouble / sdl.toDouble
      val c = terms.indices.map { i =>
        val tf = tfs(i).toDouble
        ((nd - dfs(i)).toDouble + 0.5) / (dfs(i).toDouble + 0.5) *
          (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * z)))
      }
      val raw = (c(0) + c(1)) + c(2)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ref = per.map(p => (p._1, p._2, p._3(0), p._3(1), p._3(2),
        score(p._2, p._3)))
      .sortBy(r => (-r._6, r._1)).take(10).toSeq
    assert(got.toSeq == ref)
  }

  // ---------------------------------------------------- skew profile
  test("dq_skew_profile is the exact integer top-5 key-load report") {
    val got = TrainPrep.dqSkewProfile(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val keys = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").as[Long].collect()
    val cnt = keys.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val total = cnt.values.sum
    val nKeys = cnt.size.toLong
    val ref = cnt.toSeq.map { case (k, c) =>
      (k, c, nKeys, c * 1000000L / total, c * nKeys * 100L / total)
    }.sortBy(r => (-r._2, r._1)).take(5)
    assert(got.toSeq == ref)
  }

  /** Per-user (ts, event_id)-ordered cent values, the shared fixture
    * walk for the window-family references below. */
  private def centSeries: Map[Long, Seq[(Long, Long)]] = {
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("user_id"), unix_micros(col("ts")).as("mu"), col("event_id"),
        round(col("value") * 100).cast("long").as("xc"))
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).map { case (u, rs) =>
      u -> rs.sortBy(r => (r._2, r._3)).map(r => (r._3, r._4)).toSeq
    }
  }

  // ----------------------------------------------------- rolling skew
  test("window_rolling_skew matches the naive sample-skew over each full 20-window") {
    val got = Windows.windowRollingSkew(spark, sf)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    val ref = centSeries.flatMap { case (_, s) =>
      s.zipWithIndex.map { case ((eid, _), i) =>
        val w = s.slice(i - 19, i + 1).map(_._2)
        val sk = if (i >= 19) {
          val n = 20L
          val s1 = w.sum; val s2 = w.map(x => x * x).sum
          val s3 = w.map(x => x * x * x).sum
          val den = n * s2 - s1 * s1
          if (den > 0) {
            val num = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
            val dd = den.toDouble
            val g = num.toDouble / (dd * math.sqrt(dd)) *
              math.sqrt(380.0) / 18.0
            Some(BigDecimal(g).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble + 0.0)
          } else None
        } else None
        eid -> sk
      }
    }
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    assert(got.values.exists(_.isDefined))
  }

  // -------------------------------------------------------- autocorr
  test("window_autocorr is the exact lag-1 co-moment corr; constants and short keys are null") {
    val got = Windows.windowAutocorrLag1(spark, sf)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ref = centSeries.collect { case (u, s) if s.length >= 2 =>
      val pairs = s.drop(1).map(_._2).zip(s.dropRight(1).map(_._2))
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val denx = n * sxx - sx * sx; val deny = n * syy - sy * sy
      val ac = if (n >= 3 && denx > 0 && deny > 0)
        Some(BigDecimal((n * sxy - sx * sy).toDouble /
          math.sqrt(denx.toDouble * deny.toDouble))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
      else None
      u -> ((n, ac))
    }
    assert(got == ref)
    // a 2-pair user exists in no fixture guarantee; assert the gate
    // semantics instead: every emitted corr had >= 3 pairs
    got.foreach { case (_, (n, ac)) => if (ac.isDefined) assert(n >= 3) }
  }

  // ------------------------------------------------------------ OHLC
  test("ts_resample_ohlc open/close follow the (ts, event_id) total order; high/low bound them") {
    val got = Windows.tsResampleOhlc(spark, sf)
      .as[(String, String, Double, Double, Double, Double, Long)].collect()
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd"),
        unix_micros(col("ts")), col("event_id"), col("value"))
      .as[(String, String, Long, Long, Double)].collect()
    val ref = rows.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      val ord = rs.sortBy(r => (r._3, r._4))
      k -> ((ord.head._5, rs.map(_._5).max, rs.map(_._5).min,
        ord.last._5, rs.length.toLong))
    }
    assert(got.length == ref.size)
    got.foreach { case (t, d, o, h, l, c, n) =>
      assert(ref((t, d)) == ((o, h, l, c, n)), s"($t, $d)")
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  // ------------------------------------------------------- winsorize
  test("transform_winsorize fences are the rank-based p05/p95 data values; mass is conserved") {
    val got = TrainPrep.transformWinsorize(spark, sf)
      .as[(String, Long, Double, Double, Long, Long, Double)].collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
      .as[(String, Double, Long)].collect()
    val ref = cust.groupBy(_._1).map { case (seg, rs) =>
      val ord = rs.sortBy(r => (r._2, r._3)).map(_._2)
      val n = ord.length
      val lo = ord(math.ceil(n / 20.0).toInt - 1)
      val hi = ord(math.ceil(n * 19.0 / 20.0).toInt - 1)
      val clipped = ord.map(v => math.max(lo, math.min(hi, v)))
      seg -> ((n.toLong, lo, hi,
        ord.count(_ < lo).toLong, ord.count(_ > hi).toLong,
        clipped.map(v => math.round(v * 100)).sum.toDouble / 100.0))
    }
    assert(got.length == ref.size)
    got.foreach { case (seg, n, lo, hi, nLo, nHi, ws) =>
      assert(ref(seg) == ((n, lo, hi, nLo, nHi, ws)), seg)
    }
  }

  // -------------------------------------------------------- keep last
  test("dedup_keep_last mirrors keep-first on the reversed total order") {
    val got = Windows.dedupKeepLast(spark, sf)
      .as[(Long, String, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .as[(Long, String, Long, Long)].collect()
    val ref = rows.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      k -> rs.maxBy(r => (r._3, r._4))._4
    }
    assert(got == ref)
  }

  // --------------------------------------------------- symmetric diff
  test("setop_symmetric_diff partitions into only-A and only-B exactly") {
    val got = graft.queries.SortSetOps.setopSymmetricDiff(spark, sf)
      .as[(Long, String)].collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_orderstatus", "o_totalprice")
      .as[(Long, String, Double)].collect()
    val a = orders.filter(_._2 == "F").map(_._1).toSet
    val b = orders.filter(_._3 > 100000).map(_._1).toSet
    val ref = (a -- b).toSeq.map(k => (k, "only_a")) ++
      (b -- a).toSeq.map(k => (k, "only_b"))
    assert(got.toSet == ref.toSet)
    assert(got.length == ref.length)
    // the two sides are disjoint and neither intersects A∩B
    assert(got.map(_._1).toSet.intersect(a.intersect(b)).isEmpty)
  }

  // ---------------------------------------------------- rolling minmax
  test("window_rolling_minmax equals the naive full-window extrema; partial windows null") {
    val got = Windows.windowRollingMinmax(spark, sf)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val ref = rows.groupBy(_._1).iterator.flatMap { case (_, rs) =>
      val ord = rs.sortBy(r => (r._2, r._3))
      ord.zipWithIndex.map { case (r, i) =>
        val w = ord.slice(i - 19, i + 1).map(_._4)
        r._3 -> (if (i >= 19) (Some(w.min), Some(w.max)) else (None, None))
      }
    }.toMap
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
  }

  // --------------------------------------------------- rolling z-score
  test("window_rolling_zscore matches the naive trailing-window score; flag tests the rounded z") {
    val got = Windows.windowRollingZscore(spark, sf)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    val ref = centSeries.flatMap { case (_, s) =>
      s.zipWithIndex.map { case ((eid, xc), i) =>
        val w = s.slice(i - 19, i + 1).map(_._2)
        val out = if (i >= 19) {
          val n = 20L
          val s1 = w.sum; val s2 = w.map(x => x * x).sum
          val den = n * s2 - s1 * s1
          if (den > 0) {
            val z = BigDecimal((n * xc - s1).toDouble /
              (n.toDouble * math.sqrt(den.toDouble / (n * (n - 1)).toDouble)))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
            (Some(z), Some(if (math.abs(z) > 3.0) 1.0 else 0.0))
          } else (None, None)
        } else (None, None)
        eid -> out
      }
    }
    assert(got.size == ref.size)
    ref.foreach { case (eid, v) => assert(got(eid) == v, s"event $eid") }
    assert(got.values.exists(_._2.contains(1.0)), "fixture has no 3-sigma event")
  }

  // ------------------------------------------------------ SCD-2 lookup
  test("join_scd2_lookup picks the version whose validity interval contains the order date") {
    val got = Joins.joinScd2Lookup(spark, sf)
      .as[(Long, Long, String, Long, Double)].collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_acctbal").as[(Long, Double)].collect().toMap
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .as[(Long, Long, String)].collect()
    def cut(base: String, k: Long): String =
      java.time.LocalDate.parse(base).plusDays(k % 365).toString
    val ref = orders.map { case (ok, ck, day) =>
      val bal = cust(ck)
      val versions = Seq((("1995-01-01"), 1L, bal)) ++
        (if (ck % 3 == 0) Seq((cut("1997-01-01", ck), 2L, bal + 100.0)) else Nil) ++
        (if (ck % 9 == 0) Seq((cut("1999-07-01", ck), 3L, bal + 250.0)) else Nil)
      val (_, v, b) = versions.filter(_._1 <= day).maxBy(_._1)
      (ok, ck, day, v, b)
    }.sortBy(_._1)
    assert(got.toSeq == ref.toSeq)
    // the deterministic dim really exercises all three versions
    assert(got.map(_._4).distinct.sorted.toSeq == Seq(1L, 2L, 3L))
  }

  // --------------------------------------------------- table checksum
  test("dq_table_checksum: identical buckets match, mutated buckets don't, counts reconcile") {
    val got = TrainPrep.dqTableChecksum(spark, sf)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length == 64)
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").as[Long].collect()
    // count reconciliation: n_a - n_b per bucket = deleted keys (mod 13)
    val delByBucket = cust.filter(_ % 13 == 0).groupBy(_ % 64)
      .map { case (b, ks) => b -> ks.length.toLong }
    got.foreach { case (b, na, nb, _, _, _) =>
      assert(na - nb == delByBucket.getOrElse(b, 0L), s"bucket $b")
    }
    // a bucket matches iff it holds NO mutated key (deleted or bumped)
    val touched = cust.filter(k => k % 13 == 0 || k % 11 == 0)
      .map(_ % 64).toSet
    got.foreach { case (b, _, _, cka, ckb, m) =>
      assert(m == !touched.contains(b), s"bucket $b")
      assert(m == (cka == ckb), s"bucket $b checksum vs flag")
    }
    assert(got.exists(_._6) && got.exists(!_._6))
  }

  // ----------------------------------------------- referential integrity
  test("dq_ref_integrity orphan counts equal the planted parent purge exactly") {
    val got = TrainPrep.dqRefIntegrity(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def check(edge: String, child: Array[Long], parent: Array[Long]): Unit = {
      val kept = parent.filter(_ % 97 != 0).toSet
      val orphans = child.filterNot(kept)
      val (nc, no, nk) = got(edge)
      assert(nc == child.length.toLong, edge)
      assert(no == orphans.length.toLong, edge)
      assert(nk == orphans.distinct.length.toLong, edge)
    }
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .as[(Long, Long, Long)].collect()
    val ords = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect()
    check("lineitem.l_orderkey->orders", li.map(_._1), ords.map(_._1))
    check("lineitem.l_partkey->part", li.map(_._2),
      spark.read.parquet(s"$sf/part.parquet").select("p_partkey").as[Long].collect())
    check("lineitem.l_suppkey->supplier", li.map(_._3),
      spark.read.parquet(s"$sf/supplier.parquet").select("s_suppkey").as[Long].collect())
    check("orders.o_custkey->customer", ords.map(_._2),
      spark.read.parquet(s"$sf/customer.parquet").select("c_custkey").as[Long].collect())
    assert(got.values.exists(_._2 > 0), "purge planted no orphans")
  }

  // ---------------------------------------------- CDC agg maintenance
  test("agg_refresh_cdc: signed-contribution refresh equals an outright rebuild incl. group moves") {
    val got = Aggregations.aggRefreshCdc(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .as[(Long, String, Double)].collect()
    // straight-line: apply the CDC to rows, then aggregate
    val applied = cust.filter(_._1 % 13 != 0).map { case (k, g, bal) =>
      val cents = math.round(bal * 100)
      if (k % 11 == 0)
        (if (k % 3 == 0) "MACHINERY" else g, cents + 5000L)
      else (g, cents)
    } ++ cust.filter(_._1 % 17 == 0).map { case (_, g, bal) =>
      (g, math.round(bal * 100) + 1000L)
    }
    val ref = applied.groupBy(_._1).map { case (g, rs) =>
      val n = rs.length.toLong
      val s = rs.map(_._2).sum
      (g, n, s.toDouble / 100.0,
        BigDecimal(s.toDouble / (n * 100).toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == ref)
    // the fixture genuinely exercises a group move: MACHINERY gained
    // rows from other segments
    val machBase = cust.count(r => r._2 == "MACHINERY" && r._1 % 13 != 0) +
      cust.count(r => r._2 == "MACHINERY" && r._1 % 17 == 0)
    val machGot = got.find(_._1 == "MACHINERY").get._2
    assert(machGot > machBase, "no group-moving update landed")
  }

  // -------------------------------------------------------- group nth
  test("agg_group_nth emits exactly the rank-3 order per customer; short groups emit nothing") {
    val got = graft.queries.SortSetOps.groupbyNth(spark, sf)
      .as[(Long, Long, String, Double)].collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"), col("o_totalprice"))
      .as[(Long, Long, String, Double)].collect()
    val ref = orders.groupBy(_._1).flatMap { case (_, rs) =>
      val ord = rs.sortBy(r => (r._3, r._2))
      if (ord.length >= 3) Some(ord(2)) else None
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == ref)
    assert(orders.groupBy(_._1).exists(_._2.length < 3),
      "fixture has no short group — the emit-nothing path is untested")
  }

  // ------------------------------------------------------ doc assembly
  test("denorm_order_lines concatenates each order's lines in the total (ln, qty, pk) order") {
    val got = graft.queries.SortSetOps.denormOrderLines(spark, sf)
      .as[(Long, Long, String)].collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        col("l_quantity").cast("long"), col("l_partkey"))
      .as[(Long, Long, Long, Long)].collect()
    val ref = li.groupBy(_._1).map { case (ok, rs) =>
      val ord = rs.sortBy(r => (r._2, r._3, r._4))
      (ok, rs.length.toLong, ord.map(r => s"${r._2}:${r._3}").mkString(","))
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == ref)
  }

  // ------------------------------------------------------ group filter
  test("agg_group_filter keeps exactly the rows of groups meeting the size predicate") {
    // sf0.001 has ~1500 orders over ~1500 customers; use the declared
    // threshold's semantics at a fixture-fitting k by checking against
    // the naive reference at the query's own k
    val got = Aggregations.aggGroupFilter(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .as[(Long, Long, Double)].collect()
    val sizes = orders.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ref = orders.filter(r => sizes(r._2) >= 12)
      .map(r => (r._1, r._2, sizes(r._2), r._3)).sortBy(_._1)
    assert(got.toSeq == ref.toSeq)
    // non-vacuous: the predicate keeps some groups and drops others
    assert(got.nonEmpty && got.length < orders.length)
  }

  // ------------------------------------------- quantile-uniform encode
  test("encode_quantile_uniform is percent-rank under the total order: uniform grid per segment") {
    val got = TrainPrep.encodeQuantileUniform(spark, sf)
      .as[(Long, String, Double)].collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .as[(Long, String, Double)].collect()
    val ref = cust.groupBy(_._2).iterator.flatMap { case (_, rs) =>
      val ord = rs.sortBy(r => (r._3, r._1))
      val n = ord.length
      ord.zipWithIndex.map { case (r, i) =>
        r._1 -> (if (n > 1) i.toDouble / (n - 1).toDouble else 0.0)
      }
    }.toMap
    assert(got.length == cust.length)
    got.foreach { case (k, _, pr) => assert(pr == ref(k), s"cust $k") }
    // endpoints: every segment's min maps to 0.0, max to 1.0
    val bySeg = got.groupBy(_._2)
    bySeg.values.foreach { rs =>
      assert(rs.map(_._3).min == 0.0 && rs.map(_._3).max == 1.0)
    }
  }
}
