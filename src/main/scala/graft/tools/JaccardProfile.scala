package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

// throwaway profiling harness for ngramJaccardPairs stages
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.1"
    val threshold = 0.5
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    time("raw count")(d.count())
    val corpus = d.select(col("doc_id"), lower(col("text")).as("text"))
      .unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(tokens(col("text")), 6, 1000000)).as("text")))
    time("corpus count")(corpus.count())
    time("tokens size sum")(corpus.select(size(tokens(col("text"))).as("n"))
      .agg(sum("n")).collect())
    time("ngram size sum")(corpus.select(
        size(wordNgrams(tokens(col("text")), 3)).as("n"))
      .agg(sum("n")).collect())
    time("distinct ngram size sum")(corpus.select(
        size(array_distinct(wordNgrams(tokens(col("text")), 3))).as("n"))
      .agg(sum("n")).collect())
    val g = corpus.repartition(64)
      .select(col("doc_id").as("id"),
        array_distinct(wordNgrams(tokens(col("text")), 3)).as("grams"))
      .filter(size(col("grams")) > 0).persist()
    time("gramSets count")(g.count())
    time("gramSets count again")(g.count())
    val posting = g.select(col("id"), size(col("grams")).as("sz"),
        explode(col("grams")).as("gram"))
      .select(col("id"), col("sz"), xxhash64(col("gram")).as("gram"))
    val df = posting.groupBy("gram").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("id").orderBy(col("df"), col("gram"))
    val prefix = posting.join(df, "gram")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select("id", "sz", "gram")
    val candidates = prefix.select(col("gram"), col("id").as("a"), col("sz").as("sa"))
      .join(prefix.select(col("gram"), col("id").as("b"), col("sz").as("sb")), "gram")
      .filter(col("a") < col("b") &&
        col("sb") >= col("sa") * threshold && col("sa") >= col("sb") * threshold)
      .select("a", "b").distinct().persist()
    time("candidates count")(candidates.count())
    val verified = candidates
      .join(g.select(col("id").as("a"), col("grams").as("ga")), "a")
      .join(g.select(col("id").as("b"), col("grams").as("gb")), "b")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("ga")) + size(col("gb")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
    time("verify count")(verified.count())
    time("verify count again")(verified.count())
    println(verified.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("InMemory") || l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
