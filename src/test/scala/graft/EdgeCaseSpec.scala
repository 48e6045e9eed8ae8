package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, Decontaminate, NearDup, Sessionize, ZOrderLayout}

/** Degenerate-input behavior of the reusable operators: empty frames,
  * single rows, and constant columns must produce well-defined results,
  * not exceptions or NaN surprises — a pipeline over sharded real data
  * WILL hand operators an empty or single-row partition-slice
  * eventually.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val oneDoc = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")

  test("near-dup pair generators return empty on empty and single-doc corpora") {
    for (corpus <- Seq(emptyDocs, oneDoc)) {
      assert(NearDup.ngramJaccardPairs(corpus, "doc_id", "text").isEmpty)
      assert(NearDup.minHashLshPairs(corpus, "doc_id", "text").isEmpty)
      assert(NearDup.simHashPairs(corpus, "doc_id", "text").isEmpty)
    }
  }

  test("decontamination of an empty corpus / empty benchmark is empty") {
    assert(Decontaminate.hits(emptyDocs, oneDoc, "doc_id", "text", "text", n = 2).isEmpty)
    assert(Decontaminate.hits(oneDoc, emptyDocs, "doc_id", "text", "text", n = 2).isEmpty)
    // clean of a corpus against an empty benchmark keeps everything
    assert(Decontaminate.clean(oneDoc, emptyDocs, "doc_id", "text", "text", n = 2).count() == 1)
  }

  test("asof join with an empty right side left-joins nulls, empty left is empty") {
    val left = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val right = Seq.empty[(Long, Long, Double)].toDF("k", "t", "v")
    val joined = AsofJoin.backward(left, right, "t", Seq("k"), Seq("v"))
    assert(joined.count() == 2 && joined.where(col("v").isNotNull).count() == 0)
    val noLeft = AsofJoin.backward(left.limit(0), right, "t", Seq("k"), Seq("v"))
    assert(noLeft.isEmpty)
  }

  test("sessionize: single event per user is its own session; empty input is empty") {
    val one = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    val s = Sessionize.withSessionId(one, "ts", Seq("user_id"), 1800)
    assert(s.count() == 1)
    assert(Sessionize.withSessionId(one.limit(0), "ts", Seq("user_id"), 1800).isEmpty)
  }

  test("z-order handles a constant dimension (zero span) without dividing by zero") {
    val df = Seq((1L, 5.0, 3.0), (2L, 5.0, 9.0), (3L, 5.0, 1.0)).toDF("id", "x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_zconst").toString
    try {
      ZOrderLayout.writeZOrdered(df, base + "/out", "x", "y", files = 2)
      assert(spark.read.parquet(base + "/out").count() == 3)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }

  test("z-order writes an empty layout for an empty shard (null min/max)") {
    val df = Seq.empty[(Long, Double, Double)].toDF("id", "x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_zempty").toString
    try {
      ZOrderLayout.writeZOrdered(df, base + "/out", "x", "y", files = 2)
      assert(spark.read.parquet(base + "/out").isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }
}
