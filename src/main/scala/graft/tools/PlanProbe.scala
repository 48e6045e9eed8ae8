package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.NearDup

/** Measurement-session scratch tool: run ONE NearDup family under the
  * Stress session config and print the AQE-final executed plan plus
  * stage-level timing hot spots — forensics for shuffle-width and
  * spill regressions that counts alone can't show (STRESS.md round-9).
  *
  *   runMain graft.tools.PlanProbe [replicas] [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.flatMap(_.toIntOption).getOrElse(32)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.driver.memory", "96g")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val corpus = (0 until replicas).map { k =>
      docs.select((col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
        concat_ws(" ",
          slice(split(col("text"), "\\s+"), k + 1, 1000000),
          slice(split(col("text"), "\\s+"), 1, k)).as("text"))
    }.reduce(_ unionByName _)

    val t0 = System.nanoTime()
    val pairs = NearDup.ngramJaccardPairs(corpus, "doc_id", "text", threshold = 0.8)
    // materialize THIS QueryExecution so the printed plan is the
    // AQE-final one actually executed (count() would plan its own tree
    // and leave this one isFinalPlan=false)
    val n = pairs.collect().length
    println(f"[probe] pairs=$n took ${(System.nanoTime() - t0) / 1e9}%.1f s")
    println(pairs.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0))
    spark.stop()
  }
}
