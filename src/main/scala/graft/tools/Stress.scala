package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ann, NearDup}

/** Scale-stress harness: replicates the sf0.1 fixtures N× (distinct ids,
  * perturbed content so replicas are not trivial exact dups) and runs
  * the heaviest operator families — the ones whose cost is super-linear
  * if the blocking/prefix design is wrong. The point is not a pretty
  * number; it is catching candidate-set explosions, skew, and memory
  * blowups at a multiple of the bench corpus BEFORE a real cluster does.
  *
  *   runMain graft.tools.Stress [replicas] [sfDir]
  *
  * Prints per-family wall time and output sizes; exits non-zero if any
  * family fails.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.flatMap(_.toIntOption).getOrElse(8)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    var failed = 0
    def family(label: String)(f: => Unit): Unit =
      try time(label)(f)
      catch { case e: Throwable =>
        failed += 1; println(s"[stress] $label FAILED: $e")
      }

    // documents ×N: replica k shifts ids by k*10M and rotates each text
    // by k words so near-dup structure stays realistic (each replica
    // still contains the fixture's internal near-dups, but replicas are
    // not wholesale near-dups of each other at high k)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val corpus = (0 until replicas).map { k =>
      docs.select((col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
        concat_ws(" ",
          slice(split(col("text"), "\\s+"), k + 1, 1000000),
          slice(split(col("text"), "\\s+"), 1, k)).as("text"))
    }.reduce(_ unionByName _)
    val nDocs = time(s"corpus build (${replicas}x)")(corpus.count())
    println(s"[stress] corpus: $nDocs docs")

    family("exact ngram jaccard") {
      val n = NearDup.ngramJaccardPairs(corpus, "doc_id", "text", threshold = 0.8).count()
      println(s"[stress]   pairs(t=0.8): $n")
    }
    family("minhash LSH") {
      val n = NearDup.minHashLshPairs(corpus, "doc_id", "text", threshold = 0.8).count()
      println(s"[stress]   pairs(t=0.8): $n")
    }
    family("simhash") {
      val n = NearDup.simHashPairs(corpus, "doc_id", "text", maxHamming = 2).count()
      println(s"[stress]   pairs(h<=2): $n")
    }

    // embeddings ×N: replica k shifts ids and adds k*0.001 to each
    // element (distinct vectors, same geometry)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vecs = (0 until replicas).map { k =>
      emb.select((col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
        col("label"),
        transform(col("embedding"), x => x + lit(k * 0.001f)).as("embedding"))
    }.reduce(_ unionByName _)
    val nVecs = time(s"vectors build (${replicas}x)")(vecs.count())
    println(s"[stress] vectors: $nVecs")

    val query = vecs.filter(col("vec_id") === 1)
    val rest = vecs.filter(col("vec_id") =!= 1)
    family("IVF build+probe") {
      val idx = Ann.ivfBuild(rest, "embedding", nCentroids = 64)
      try {
        val n = Ann.ivfProbe(idx, query, "embedding", "vec_id", 10, nProbe = 4).count()
        println(s"[stress]   ivf top-k rows: $n")
      } finally idx.release()
    }
    family("LSH build+probe") {
      val idx = Ann.lshBuild(rest, "embedding", nPlanes = 6, dim = 64)
      try {
        val n = Ann.lshProbe(idx, query, "embedding", "vec_id", 10).count()
        println(s"[stress]   lsh top-k rows: $n")
      } finally idx.release()
    }
    family("brute-force batch (32 queries)") {
      val qs = vecs.filter(col("vec_id") < 32)
      val n = Ann.bruteForceTopKBatch(rest, qs, "embedding", "vec_id", "vec_id", 10).count()
      println(s"[stress]   batch rows: $n")
    }

    org.apache.spark.sql.graft.ListenerBus.flush(spark)
    val pinned = spark.sparkContext.getPersistentRDDs.size
    println(s"[stress] persisted RDDs at exit: $pinned (expect 0)")
    if (pinned > 0) failed += 1
    spark.stop()
    if (failed > 0) { println(s"[stress] $failed FAILURES"); sys.exit(1) }
    println("[stress] all families passed")
  }
}
