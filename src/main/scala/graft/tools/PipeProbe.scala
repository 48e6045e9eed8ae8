package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._
import graft.tables.Tables

/** Throwaway timing bisect for pipe_clean (round-6 perf work). */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir).documents
    docs.count()
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    val scored = docs.select(col("doc_id"), col("text"),
      size(tokens(col("text"))).as("n_tokens"),
      round(qualityScore(col("text")), 4).as("quality"))
    t("score only")(scored)
    t("score+window")(scored.withColumn("__rn", row_number().over(w)))
    t("score+window+gate")(scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("quality") >= 0.5))
    t("score+window+gate+langid")(scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("quality") >= 0.5)
      .withColumn("predicted_lang", langId(col("text")))
      .filter(col("predicted_lang") =!= "und"))
    t("langid alone")(docs.select(langId(col("text")).as("p")))
    t("quality alone")(docs.select(round(qualityScore(col("text")), 4).as("q")))
    t("tokens alone")(docs.select(size(tokens(col("text"))).as("n")))
    t("stop_ratio alone")(docs.select(round(stopwordRatio(tokens(col("text"))), 4).as("s")))
    spark.stop()
  }
}
