package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.FastText

// stage-by-stage profiling harness for the CURRENT ngramJaccardPairs
// pipeline (prefix filtering + PPJoin positional filter + kernel
// verify) — mirrors NearDup.ngramJaccardPairs so a regression can be
// attributed to a stage, not just a query total
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.5
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    time("raw count")(d.count())
    // the same planted corpus the declared query uses
    val corpus = graft.queries.TextOps.plantedCorpus(spark, sfDir)
    time("corpus count")(corpus.count())
    // hash-set form, mirroring NearDup.gramHashSets (round 7: gram
    // strings never enter a shuffle or cache on the exact path)
    val g = corpus.repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id").as("id"),
        array_sort(transform(FastText.ngramSet(col("text"), 3),
          x => xxhash64(x))).as("gh"))
      .filter(size(col("gh")) > 0).persist()
    time("gramSets build+count")(g.count())
    time("gramSets cached count")(g.count())
    val posting = g.select(col("id"), size(col("gh")).as("sz"),
        explode(col("gh")).as("gram"))
    val dfreq = posting.groupBy("gram").agg(count(lit(1)).as("df"))
    time("df agg count")(dfreq.count())
    val byRarity = Window.partitionBy("id").orderBy(col("df"), col("gram"))
    val prefix = posting.join(dfreq, "gram")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select("id", "sz", "gram", "rn").persist()
    time("prefix build+count")(prefix.count())
    val candidates = prefix.select(col("gram"), col("id").as("a"),
        col("sz").as("sa"), col("rn").as("ra"))
      .join(prefix.select(col("gram"), col("id").as("b"),
        col("sz").as("sb"), col("rn").as("rb")), "gram")
      .filter(col("a") < col("b") &&
        col("sb") >= col("sa") * threshold && col("sa") >= col("sb") * threshold)
      .groupBy("a", "b", "sa", "sb")
      .agg(count(lit(1)).as("c"), max("ra").as("ia"), max("rb").as("jb"))
      .withColumn("ub",
        col("c") + least(col("sa") - col("ia"), col("sb") - col("jb")))
      .filter(col("ub").cast("double") /
        (col("sa") + col("sb") - col("ub")).cast("double") >= threshold)
      .select("a", "b").persist()
    time("candidates (pos-filter)")(println(s"  candidates: ${candidates.count()}"))
    val verified = candidates
      .join(g.select(col("id").as("a"), col("gh").as("ga")), "a")
      .join(g.select(col("id").as("b"), col("gh").as("gb")), "b")
      .withColumn("jaccard", FastText.jaccardHash(col("ga"), col("gb")))
      .filter(col("jaccard") >= threshold)
    time("verify count")(println(s"  verified: ${verified.count()}"))
    g.unpersist(); prefix.unpersist(); candidates.unpersist()
    spark.stop()
  }
}
