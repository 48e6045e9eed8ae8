package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AQE skew-join wall-time demonstration at stress scale, with the
  * UNSCALED production-default thresholds (256 MB skewed-partition
  * threshold, 64 MB advisory size) — the spec (AqeSkewJoinSpec) proves
  * the mechanism at test scale with scaled-down thresholds; this tool
  * proves the planted hot partition is big enough to trip the REAL
  * defaults and records what the split buys in wall time.
  *
  *   runMain graft.tools.SkewJoinDemo [factRows] [hotPct] [passes]
  *
  * Shape: fact(k, 2×md5 payload) with hotPct% of rows on key 0, dim of
  * 100k keys, shuffle inner join (broadcast disabled), global checksum
  * agg so the skew split adds no downstream shuffle. Defaults: 20M fact
  * rows, 40% hot → the hot partition carries ~8M rows × ~70 B ≈ 500 MB
  * of map output, >2× the 256 MB default threshold, while the median
  * partition holds ~13 MB. Prints per-pass seconds for skew=on/off and
  * ONE JSON line {"skew_demo":..., "on":[...], "off":[...],
  * "split_seen":bool, "checksum_equal":bool} for STRESS.md.
  */
object SkewJoinDemo {
  def main(args: Array[String]): Unit = {
    val factRows = args.headOption.flatMap(_.toLongOption).getOrElse(20000000L)
    val hotPct = args.lift(1).flatMap(_.toIntOption).getOrElse(40)
    val passes = args.lift(2).flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // production defaults, NOT scaled down — stated explicitly so the
      // record is self-describing
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fact = spark.range(factRows).select(
      when(col("id") % 100 < hotPct, 0L).otherwise(col("id") % 100000L).as("k"),
      md5(col("id").cast("string")).as("p1"),
      md5((col("id") + 1).cast("string")).as("p2"))
    val dim = spark.range(100000L).select(
      col("id").as("k"), md5(col("id").cast("string")).as("d"))

    def run(skewOn: Boolean): (Seq[Double], Long, Long, Boolean) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      var n = 0L; var chk = 0L; var split = false
      val times = (1 to passes).map { p =>
        val agg = fact.join(dim, "k").agg(
          count(lit(1)).as("n"),
          sum(crc32(concat_ws("|", col("k"), col("p1"), col("p2"), col("d")))).as("chk"))
        val t0 = System.nanoTime()
        val row = agg.collect()(0)
        val secs = (System.nanoTime() - t0) / 1e9
        n = row.getLong(0); chk = row.getLong(1)
        split = agg.queryExecution.executedPlan.toString.contains("skew=true")
        println(f"[skew] skewJoin=$skewOn%-5s pass $p: $secs%7.2f s  (split=$split)")
        secs
      }
      (times, n, chk, split)
    }

    val (offT, offN, offChk, offSplit) = run(skewOn = false)
    val (onT, onN, onChk, onSplit) = run(skewOn = true)
    val ok = onN == offN && onChk == offChk && onSplit && !offSplit
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(s"""{"skew_demo":$factRows,"hot_pct":$hotPct,"on":${arr(onT)},"off":${arr(offT)},"split_seen":$onSplit,"checksum_equal":${onN == offN && onChk == offChk}}""")
    spark.stop()
    if (!ok) { println("[skew] FAILED (split not seen or results diverge)"); sys.exit(1) }
  }
}
