package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-probe for the PIT multi arm's pre-window segment: where does
  * the k=8 union's wall go — the replicated scans, the filters, the
  * struct projections, or the union stage itself? Each arm is min-of-3
  * in one warm JVM.
  *
  *   runMain graft.tools.UnionProbe [replicas] [sfDir]
  */
object UnionProbe {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.flatMap(_.toIntOption).getOrElse(8)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
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

    def minOf3(f: => Long): Double = {
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }
    def t(label: String)(f: => Long): Unit =
      println(f"[union] $label%-34s ${minOf3(f)}%6.2f s")

    val k = 8
    val labels = ev.select(col("event_id"), col("user_id"), col("ts"))
    def stream(i: Int): DataFrame =
      ev.filter(col("event_type") === "click" &&
          pmod(col("event_id"), lit(k.toLong)) === i)
        .select(col("user_id"), col("ts"), col("value").as(s"f$i"))

    t("ev.count (8 scans)")(ev.count())
    t("labels.count")(labels.count())
    t("one stream count (8 scans)")(stream(0).count())
    t("8 streams unioned, no structs") {
      (0 until k).map(i => stream(i).withColumnRenamed(s"f$i", "v"))
        .reduce(_ unionByName _).count()
    }
    // labels + 8 streams with the backwardMulti projection shape
    def fullUnion(ks: Int): DataFrame = {
      val l2 = labels.withColumn("__side", lit("L")).withColumn("__tag", lit(1))
        .withColumn("__sid", lit(null).cast("int"))
      val tagged = (0 until ks).map { i =>
        stream(i).select(col("user_id"), col("ts"), lit(i).as("__sid"),
            struct(col("ts").as("__rts"), col(s"f$i").as("v")).as(s"__p$i"))
          .withColumn("__side", lit("R")).withColumn("__tag", lit(0))
      }
      tagged.foldLeft(l2)((a, b) => a.unionByName(b, allowMissingColumns = true))
    }
    t("full union k=2 count")(fullUnion(2).count())
    t("full union k=8 count")(fullUnion(8).count())
    t("full union k=8 noop write") {
      fullUnion(8).write.format("noop").mode("overwrite").save(); 0L
    }
    // the same 9 branches but each branch's scan cached first
    val evC = ev.cache(); evC.count()
    val labelsC = evC.select(col("event_id"), col("user_id"), col("ts"))
    def streamC(i: Int): DataFrame =
      evC.filter(col("event_type") === "click" &&
          pmod(col("event_id"), lit(k.toLong)) === i)
        .select(col("user_id"), col("ts"), col("value").as(s"f$i"))
    def fullUnionC(ks: Int): DataFrame = {
      val l2 = labelsC.withColumn("__side", lit("L")).withColumn("__tag", lit(1))
        .withColumn("__sid", lit(null).cast("int"))
      val tagged = (0 until ks).map { i =>
        streamC(i).select(col("user_id"), col("ts"), lit(i).as("__sid"),
            struct(col("ts").as("__rts"), col(s"f$i").as("v")).as(s"__p$i"))
          .withColumn("__side", lit("R")).withColumn("__tag", lit(0))
      }
      tagged.foldLeft(l2)((a, b) => a.unionByName(b, allowMissingColumns = true))
    }
    t("full union k=8 count (ev cached)")(fullUnionC(8).count())
    println("[union] partitions: ev=" + ev.rdd.getNumPartitions +
      " fullUnion8=" + fullUnion(8).rdd.getNumPartitions)
    spark.stop()
  }
}
