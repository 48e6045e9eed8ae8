package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Scratch profiling entry for stage-by-stage timing of near-dup
  * pipelines (not part of the public surface).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = d.select(col("doc_id"), lower(col("text")).as("text"))
      .unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(tokens(col("text")), 6, 1000000)).as("text")))

    val g = corpus.select(col("doc_id").as("id"),
        array_distinct(wordNgrams(tokens(col("text")), 3)).as("grams"))
      .filter(size(col("grams")) > 0)
    time("gramSets count")(println(g.count()))
    val sig = g.withColumn("sig", minHashSignature_(col("grams"), 32))
    time("signatures")(println(sig.select(sum(size(col("sig")))).head()))
    val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(7)),
          b => xxhash64(concat_ws(",",
            transform(slice(col("sig"), b * 4 + 1, lit(4)), x => x.cast("string")))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("banded count")(println(banded.count()))
    val cand = banded.select(col("band"), col("bucket"), col("id").as("a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("b")), Seq("band", "bucket"))
      .filter(col("a") < col("b")).select("a", "b")
    time("candidate rows (pre-distinct)")(println(cand.count()))
    time("candidates distinct")(println(cand.distinct().count()))
    spark.stop()
  }

  private def minHashSignature_(grams: org.apache.spark.sql.Column, k: Int) =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(grams, g => xxhash64(concat(g, lit("#"), s)))))
}
