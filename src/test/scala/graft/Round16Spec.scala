package graft

import org.apache.spark.sql.functions._
import graft.queries.GraphOps

/** Round-16 additions: the hub-degree guard on the RA wedge expansion
  * (r15 verdict #1) and its exactness/boundedness contract.
  */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  test("resourceAllocScores: cap >= max degree is exact on the fixture graph") {
    val g = graft.tables.CoPurchaseGraph(spark, sf)
    val e = g.directedEdges
    val maxDeg = e.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max("d")).head().getLong(0)
    assert(maxDeg <= 1024L,
      s"fixture max degree $maxDeg outgrew the declared cap — bump capC")
    val capped = GraphOps.resourceAllocScores(e, capC = 1024)
      .as[(Long, Long, Long, Long)].collect().toSet
    val uncapped = GraphOps.resourceAllocScores(e, capC = Int.MaxValue)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(capped == uncapped && capped.nonEmpty)
  }

  test("resourceAllocScores: planted hub is enumeration-bounded, scores keep the true degree") {
    val h = 20
    val spokes = spark.range(1, h + 1L)
    val star = spokes.select(lit(0L).as("src"), col("id").as("dst"))
      .unionByName(spokes.select(col("id").as("src"), lit(0L).as("dst")))
    val cap = 8
    val got = GraphOps.resourceAllocScores(star, capC = cap)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    // only the hub (deg h) makes wedges; capped to its `cap` SMALLEST
    // neighbors -> exactly C(cap,2) pairs over spokes 1..cap
    val expect = (for (a <- 1 to cap; b <- (a + 1) to cap)
      yield (a.toLong, b.toLong, 1000000000L / h, 1L)).sortBy(r => (r._1, r._2))
    assert(got == expect)
    // uncapped for contrast: the full C(h,2) blow-up from one key
    assert(GraphOps.resourceAllocScores(star, capC = Int.MaxValue).count()
      == h.toLong * (h - 1) / 2)
  }

  test("graph_resource_alloc: the n_common floor is lossless on the fixture top-50") {
    val g = graft.tables.CoPurchaseGraph(spark, sf)
    val scored = GraphOps.resourceAllocScores(g.directedEdges, capC = 1024)
    val ce = g.canonicalEdges
    val unfloored = scored
      .join(ce, scored("a") === ce("u") && scored("b") === ce("v"), "left_anti")
      .orderBy(col("score_ppb").desc, col("a"), col("b")).limit(50)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(unfloored.forall(_._4 >= 2L),
      "a 1-common-neighbor pair reached the fixture top-50; the declared floor is lossy here")
    val floored = GraphOps.graphResourceAlloc(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(floored == unfloored)
  }

  test("map_overlap rolling mean equals the window-function twin across partition boundaries") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.tables.Tables(spark, sf).events
      .select(col("event_id"), unix_micros(col("ts")).as("tus"),
        round(col("value") * 100).cast("long").as("cents"))
    val w = Window.orderBy(col("tus"), col("event_id")).rowsBetween(-3, 0)
    val want = ev.select(col("event_id"),
        (sum("cents").over(w).cast("double") / count(lit(1)).over(w) / 100.0)
          .as("m"))
      .as[(Long, Double)].collect().toMap
    // 7 partitions on a small fixture -> thin buckets; before=3 must
    // stitch across them
    val got = graft.operators.MapOverlap.mapOverlap(
        ev.as[(Long, Long, Long)], 7, struct(col("tus"), col("event_id")),
        before = 3, after = 0) { rows =>
      rows.indices.map { i =>
        val lo = math.max(0, i - 3)
        val s = (lo to i).map(rows(_)._3).sum
        (rows(i)._1, s.toDouble / (i - lo + 1) / 100.0)
      }
    }.collect().toMap
    assert(got == want && got.nonEmpty)
  }

  test("map_overlap: lookahead, empty range buckets, and multi-partition walks stay exact") {
    // 5 rows into 16 range partitions: most buckets empty, every
    // boundary walk crosses several partitions in both directions
    val ds = spark.createDataset(Seq(1L, 2L, 3L, 4L, 5L).map(i => (i, i * 10)))
    val got = graft.operators.MapOverlap.mapOverlap(ds, 16, col("_1"),
        before = 5, after = 2) { rows =>
      rows.indices.map { i =>
        val lo = math.max(0, i - 5); val hi = math.min(rows.length - 1, i + 2)
        (rows(i)._1, (lo to hi).map(rows(_)._2).sum)
      }
    }.collect().toMap
    // centered sums over the FULL series: boundaries leaked nothing
    assert(got == Map(1L -> 60, 2L -> 100, 3L -> 150, 4L -> 150, 5L -> 150))
  }

  test("map_overlap: a length-changing UDF fails loudly") {
    val ds = spark.createDataset(Seq(1L, 2L, 3L))
    val ex = intercept[org.apache.spark.SparkException] {
      graft.operators.MapOverlap.mapOverlap(ds, 2, col("value"),
        before = 1, after = 0)(rows => rows.drop(1)).collect()
    }
    assert(ex.getMessage.contains("length-preserving") ||
      Option(ex.getCause).exists(_.getMessage.contains("length-preserving")))
  }

  test("agg_trimmed_mean equals a naive sorted-trim reference") {
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .as[(String, Long)].collect().toSeq
    val want = rows.groupBy(_._1).map { case (et, xs) =>
      val sorted = xs.map(_._2).sorted
      val k = sorted.length / 10
      val kept = sorted.slice(k, sorted.length - k)
      val m = BigDecimal(kept.sum.toDouble / kept.length / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      et -> ((kept.length.toLong, m))
    }
    val got = graft.queries.Aggregations.aggTrimmedMean(spark, sf)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("agg_harmonic_mean equals a naive reciprocal-sum reference") {
    val rows = graft.tables.Tables(spark, sf).events
      .filter(col("value") > 0)
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect().toSeq
    val want = rows.groupBy(_._1).map { case (et, xs) =>
      // same lattice: each reciprocal quantized to 1e-12 before the sum
      val s = xs.map(x => BigDecimal(1.0 / x._2)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
      val hm = BigDecimal(xs.length.toDouble / s.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      et -> ((xs.length.toLong, hm))
    }
    val got = graft.queries.Aggregations.aggHarmonicMean(spark, sf)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("dq_benford: digits from the cents string, shares in exact ppm") {
    val cents = graft.tables.Tables(spark, sf).orders
      .select(round(col("o_totalprice") * 100).cast("long"))
      .as[Long].collect().toSeq
    val byDigit = cents.map(_.toString.head.asDigit).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val total = cents.length.toLong
    val benford = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L,
      9 -> 45757L)
    val got = graft.queries.TrainPrep.dqBenford(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == got.map(_._1).sorted)
    got.foreach { case (d, n, share, bp, delta) =>
      assert(n == byDigit(d))
      assert(share == n * 1000000L / total)
      assert(bp == benford(d) && delta == share - bp)
    }
    assert(got.map(_._2).sum == total)
  }

  test("TokenCorpus.append: incremental insert equals rebuild over the union; co-location survives") {
    val docs = graft.tables.Tables(spark, sf).documents
    val base = docs.filter(col("doc_id") % 2 === 0)
    val delta = docs.filter(col("doc_id") % 2 === 1)
    try {
      graft.tables.TokenCorpus.build(base, "tok_appendspec_inc", buckets = 4)
      graft.tables.TokenCorpus.append(spark, "tok_appendspec_inc", delta)
      graft.tables.TokenCorpus.build(docs, "tok_appendspec_full", buckets = 4)
      def rows(t: String) = spark.table(t)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(rows("tok_appendspec_inc") == rows("tok_appendspec_full") &&
        rows("tok_appendspec_inc").nonEmpty)
      // the appended table still co-locates a tok-keyed join: the df
      // aggregate + join plan has no hash exchange on the big side
      val t = spark.table("tok_appendspec_inc")
      val joined = t.join(t.groupBy("tok").agg(count(lit(1)).as("df")), "tok")
      val nEx = joined.queryExecution.executedPlan.toString
        .sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      assert(nEx == 0, s"append broke co-location: $nEx hash exchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS tok_appendspec_inc")
      spark.sql("DROP TABLE IF EXISTS tok_appendspec_full")
    }
  }

  test("text_tfidf_table is layout-blind: identical rows to the raw-text twin") {
    val raw = graft.queries.TrainPrep.textTfidfTopterms(spark, sf)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    val tbl = graft.queries.TrainPrep.textTfidfTable(spark, sf)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    assert(tbl == raw && raw.nonEmpty)
  }

  test("ts_holt_forecast equals a naive sequential Holt; exact on linear series") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    def holt(xs: Seq[Double]): (Double, Double, Double) = {
      var l = xs(0); var b = xs(1) - xs(0)
      for (t <- 1 until xs.length) {
        val x = xs(t)
        val lNew = 0.3 * x + 0.7 * (l + b)
        b = 0.2 * (lNew - l) + 0.8 * b
        l = lNew
      }
      (r6(l / 100), r6(b / 100), r6((l + 7 * b) / 100))
    }
    val daily = graft.tables.Tables(spark, sf).events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("xc"))
      .select(col("user_id"), col("day").cast("string"), col("xc"))
      .as[(Long, String, Long)].collect().toSeq
    val want = daily.groupBy(_._1).collect {
      case (u, rows) if rows.size >= 2 =>
        u -> ((rows.size.toLong,
          holt(rows.sortBy(_._2).map(_._3.toDouble))))
    }
    val got = graft.queries.Windows.tsHoltForecast(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, (r._3, r._4, r._5)))).toMap
    assert(got == want && got.nonEmpty)
    // exact tracking on a perfectly linear series: level = last point,
    // trend = slope, forecast continues the line — the property that
    // makes Holt a sane baseline forecaster
    val lin = (0 until 30).map(t => 1000.0 + 250.0 * t) // cents
    val (lv, tr, fc) = holt(lin)
    assert(lv == r6(lin.last / 100) && tr == 2.5 &&
      fc == r6((lin.last + 7 * 250.0) / 100), s"($lv, $tr, $fc)")
  }

  test("agg_spearman equals a naive tie-averaged-rank Pearson") {
    val rows = graft.tables.Tables(spark, sf).events
      .select(col("event_type"), round(col("value") * 100).cast("long"),
        pmod(col("event_id"), lit(97L)))
      .as[(String, Long, Long)].collect().toSeq
    def avgRanks2(xs: Seq[Long]): Seq[Long] = {
      // 2x the average rank of each value under competition ranking
      val byV = xs.sorted.zipWithIndex.groupBy(_._1)
        .view.mapValues { g =>
          val idxs = g.map(_._2 + 1L)
          idxs.min + idxs.max // = 2 * average rank
        }.toMap
      xs.map(byV)
    }
    val want = rows.groupBy(_._1).map { case (et, g) =>
      val rx = avgRanks2(g.map(_._2)).map(BigInt(_))
      val ry = avgRanks2(g.map(_._3)).map(BigInt(_))
      val n = BigInt(g.size)
      val sx = rx.sum; val sy = ry.sum
      val sxx = rx.map(v => v * v).sum; val syy = ry.map(v => v * v).sum
      val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      val rho =
        if (g.size >= 2 && dx > 0 && dy > 0)
          Some(BigDecimal((n * sxy - sx * sy).toDouble /
            (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
        else None
      et -> ((g.size.toLong, rho))
    }
    val got = graft.queries.Aggregations.aggSpearman(spark, sf)
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want && got.nonEmpty)
    // ties exist on both axes by construction (mod 97, cent grid) —
    // the tie-average identity must actually be exercised
    assert(rows.groupBy(r => (r._1, r._3)).values.exists(_.size > 1))
  }

  test("text_bm25_table is layout-blind: identical rows to the raw-text twin") {
    val raw = graft.queries.TrainPrep.textBm25Topk(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    val tbl = graft.queries.TrainPrep.textBm25Table(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(tbl == raw && raw.nonEmpty)
  }
}
