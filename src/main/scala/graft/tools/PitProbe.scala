package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin
import graft.operators.AsofJoin.AsofStream

/** Measurement-session probe for the k-stream PIT join: multi (one
  * union+window) vs chained (k backward passes) at k ∈ {2,4,8}, labels
  * small (purchases) and labels large (all events), min of 3 passes
  * per arm inside ONE warm JVM — the Stress harness times each family
  * once, which let JIT warmup land on whichever family ran first.
  *
  *   runMain graft.tools.PitProbe [replicas] [sfDir] [k1,k2,...] [nodiag]
  *
  * The optional k-list extends the sweep to feature-store widths
  * (16/32); `nodiag` skips the k=8 decomposition block (round-14
  * forensics, already recorded in STRESS.md).
  */
object PitProbe {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.flatMap(_.toIntOption).getOrElse(8)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(2).map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(2, 4, 8))
    val runDiag = !args.contains("nodiag")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e0 = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
    val ev = (0 until replicas).map { k =>
      e0.select((col("user_id") + lit(k.toLong * 10000000L)).as("user_id"),
        col("ts"),
        (col("event_id") + lit(k.toLong * 1000000000L)).as("event_id"),
        col("event_type"), col("value"))
    }.reduce(_ unionByName _)

    def sides(k: Int, bigLabels: Boolean) = {
      val labels = (if (bigLabels) ev
        else ev.filter(col("event_type") === "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"))
      val streams = (0 until k).map { i =>
        AsofStream(
          ev.filter(col("event_type") === "click" &&
              pmod(col("event_id"), lit(k.toLong)) === i)
            .select(col("user_id"), col("ts"), col("value").as(s"f$i")),
          Seq(s"f$i"))
      }
      (labels, streams)
    }
    def minOf3(f: => Long): (Double, Long) = {
      var best = Double.MaxValue; var n = 0L
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, n)
    }
    // warm up both code paths once before timing anything
    { val (l, s) = sides(2, bigLabels = false)
      AsofJoin.backwardMulti(l, s, "ts", Seq("user_id")).count()
      AsofJoin.backward(l, s.head.right, "ts", Seq("user_id"),
        s.head.payload).count() }

    // diagnostic variants at k=8, labels=ALL: which cost dominates?
    if (runDiag) {
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      val (l, s) = sides(8, bigLabels = true)
      val k = s.size
      // A: drop the per-stream payload sort keys (loses deterministic
      // duplicate arbitration) — isolates sort-key cost
      def multiNoTie(): Long = {
        val l2 = l.withColumn("__side", lit("L")).withColumn("__tag", lit(1))
        val tagged = s.zipWithIndex.map { case (st, i) =>
          st.right.select(col("user_id"), col("ts"),
              struct(col("ts").as("__rts"),
                col(st.payload.head)).as(s"__p$i"))
            .withColumn("__side", lit("R")).withColumn("__tag", lit(0))
        }
        val u = tagged.foldLeft(l2)(
          (a, b) => a.unionByName(b, allowMissingColumns = true))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("__tag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val m = (0 until k).foldLeft(u)((df, i) =>
          df.withColumn(s"__m$i", last(col(s"__p$i"), ignoreNulls = true).over(w)))
        m.filter(col("__side") === "L")
          .select(col("event_id") +: (0 until k).map(i =>
            col(s"__m$i.f$i").as(s"f$i")): _*)
          .filter(col("f0").isNotNull).count()
      }
      // B: ONE narrow payload struct + stream id column (sort keys
      // constant in k, row width constant in k), conditional lasts
      def multiNarrow(): Long = {
        val l2 = l.withColumn("__side", lit("L")).withColumn("__tag", lit(1))
          .withColumn("__sid", lit(null).cast("int"))
          .withColumn("__p", lit(null).cast("struct<__rts:timestamp,v:double>"))
        val tagged = s.zipWithIndex.map { case (st, i) =>
          st.right.select(col("user_id"), col("ts"), lit(i).as("__sid"),
              struct(col("ts").as("__rts"),
                col(st.payload.head).as("v")).as("__p"))
            .withColumn("__side", lit("R")).withColumn("__tag", lit(0))
        }
        val u = tagged.foldLeft(l2)(
          (a, b) => a.unionByName(b, allowMissingColumns = true))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("__tag"), col("__sid"), col("__p"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val m = (0 until k).foldLeft(u)((df, i) =>
          df.withColumn(s"__m$i",
            last(when(col("__sid") === i, col("__p")),
              ignoreNulls = true).over(w)))
        m.filter(col("__side") === "L")
          .select(col("event_id") +: (0 until k).map(i =>
            col(s"__m$i.v").as(s"f$i")): _*)
          .filter(col("f0").isNotNull).count()
      }
      val (ta, _) = minOf3(multiNoTie())
      val (tb, _) = minOf3(multiNarrow())
      println(f"[pit] diag k=8 ALL: multiNoTie $ta%6.2f s   multiNarrow $tb%6.2f s")
      // C: the same k=8 union and window but only ONE last() — if this
      // collapses to ~chained-per-pass time, per-function evaluation in
      // WindowExec is the whole gap
      def multiOneFn(): Long = {
        val l2 = l.withColumn("__side", lit("L")).withColumn("__tag", lit(1))
        val tagged = s.zipWithIndex.map { case (st, i) =>
          st.right.select(col("user_id"), col("ts"),
              struct(col("ts").as("__rts"),
                col(st.payload.head)).as(s"__p$i"))
            .withColumn("__side", lit("R")).withColumn("__tag", lit(0))
        }
        val u = tagged.foldLeft(l2)(
          (a, b) => a.unionByName(b, allowMissingColumns = true))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("__tag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn("__m0", last(col("__p0"), ignoreNulls = true).over(w))
          .filter(col("__side") === "L")
          .select(col("event_id"), col("__m0.f0").as("f0"))
          .filter(col("f0").isNotNull).count()
      }
      val (tc1, _) = minOf3(multiOneFn())
      println(f"[pit] diag k=8 ALL: multiOneFn $tc1%6.2f s")
      // D: narrow rows AND one function; E: union alone (noop write, no
      // window); F: one chained pass (labels + stream0 only)
      def narrowUnion(): DataFrame = {
        val l2 = l.withColumn("__side", lit("L")).withColumn("__tag", lit(1))
          .withColumn("__sid", lit(null).cast("int"))
          .withColumn("__p", lit(null).cast("struct<__rts:timestamp,v:double>"))
        val tagged = s.zipWithIndex.map { case (st, i) =>
          st.right.select(col("user_id"), col("ts"), lit(i).as("__sid"),
              struct(col("ts").as("__rts"),
                col(st.payload.head).as("v")).as("__p"))
            .withColumn("__side", lit("R")).withColumn("__tag", lit(0))
        }
        tagged.foldLeft(l2)(
          (a, b) => a.unionByName(b, allowMissingColumns = true))
      }
      def narrowOneFn(): Long = {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("__tag"), col("__sid"), col("__p"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        narrowUnion()
          .withColumn("__m0", last(when(col("__sid") === 0, col("__p")),
            ignoreNulls = true).over(w))
          .filter(col("__side") === "L")
          .select(col("event_id"), col("__m0.v").as("f0"))
          .filter(col("f0").isNotNull).count()
      }
      def unionOnly(): Long = {
        narrowUnion().write.format("noop").mode("overwrite").save(); 0L
      }
      def onePass(): Long =
        AsofJoin.backward(l, s.head.right, "ts", Seq("user_id"),
          s.head.payload).filter(col("f0").isNotNull).count()
      val (td, _) = minOf3(narrowOneFn())
      val (te, _) = minOf3(unionOnly())
      val (tf, _) = minOf3(onePass())
      println(f"[pit] diag k=8 ALL: narrowOneFn $td%6.2f s   unionOnly $te%6.2f s   onePass $tf%6.2f s")
      // plan anatomy: exchanges / sorts / windows in each form
      def anatomy(df: DataFrame, label: String): Unit = {
        df.write.format("noop").mode("overwrite").save()
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        def c(n: String) = p.sliding(n.length).count(_ == n)
        println(s"[pit] plan $label: exchanges=${c("Exchange hashpartitioning")} " +
          s"sorts=${c("Sort ")} windows=${c("Window")} scans=${c("FileScan")}")
      }
      anatomy(AsofJoin.backwardMulti(l, s, "ts", Seq("user_id")), "multi  k=8")
      anatomy(s.foldLeft(l)((acc, st) => AsofJoin.backward(acc, st.right,
        "ts", Seq("user_id"), st.payload)), "chained k=8")
    }

    for (big <- Seq(false, true); k <- ks) {
      val (l, s) = sides(k, big)
      val multi = AsofJoin.backwardMulti(l, s, "ts", Seq("user_id"))
        .filter(col("f0").isNotNull)
      val chain = s.foldLeft(l)((acc, st) => AsofJoin.backward(acc,
          st.right, "ts", Seq("user_id"), st.payload))
        .filter(col("f0").isNotNull)
      val (tm, nm) = minOf3(multi.count())
      val (tc, nc) = minOf3(chain.count())
      require(nm == nc, s"multi/chained row mismatch: $nm vs $nc")
      val sm = org.apache.spark.sql.graft.ShuffleStats.of(multi)
      val sc = org.apache.spark.sql.graft.ShuffleStats.of(chain)
      println(f"[pit] labels=${if (big) "ALL " else "purch"} k=$k%d  " +
        f"multi $tm%6.2f s (${sm.records}%d recs / ${sm.bytes / 1000000}%d MB " +
        f"through ${sm.exchanges}%d exch)   " +
        f"chained $tc%6.2f s (${sc.records}%d recs / ${sc.bytes / 1000000}%d MB " +
        f"through ${sc.exchanges}%d exch)   rows $nm%d")
    }

    // The same sweep with the events source CACHED: the uncached arms
    // above conflate the operator's cost with a fixture artifact — all
    // k streams re-derive the SAME 8-partition events union, so the
    // multi plan's single union stage runs (k+1)x8 concurrent parquet
    // decodes of one file and saturates this box's memory bandwidth
    // (UnionProbe: full union k=8 count 2.09 s uncached vs 0.31 s
    // cached), while the chained plan reads the same 72 scans spread
    // across its k stages. Caching decouples the input side and
    // measures the window kernel itself, which is the axis round 15's
    // packed MultiLastAsof is meant to flatten. A real feature store
    // reads k DISTINCT tables, whose decodes are uncorrelated.
    ev.cache(); ev.count()
    for (big <- Seq(false, true); k <- ks) {
      val (l, s) = sides(k, big)
      val multi = AsofJoin.backwardMulti(l, s, "ts", Seq("user_id"))
        .filter(col("f0").isNotNull)
      val chain = s.foldLeft(l)((acc, st) => AsofJoin.backward(acc,
          st.right, "ts", Seq("user_id"), st.payload))
        .filter(col("f0").isNotNull)
      val (tm, nm) = minOf3(multi.count())
      val (tc, nc) = minOf3(chain.count())
      require(nm == nc, s"multi/chained row mismatch: $nm vs $nc")
      val sm = org.apache.spark.sql.graft.ShuffleStats.of(multi)
      val sc = org.apache.spark.sql.graft.ShuffleStats.of(chain)
      println(f"[pit] CACHED labels=${if (big) "ALL " else "purch"} k=$k%d  " +
        f"multi $tm%6.2f s (${sm.records}%d recs / ${sm.bytes / 1000000}%d MB " +
        f"through ${sm.exchanges}%d exch)   " +
        f"chained $tc%6.2f s (${sc.records}%d recs / ${sc.bytes / 1000000}%d MB " +
        f"through ${sc.exchanges}%d exch)   rows $nm%d")
    }
    spark.stop()
  }
}
