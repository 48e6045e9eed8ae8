package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomPrefilter
import graft.queries.{Joins, TrainPrep}

/** Round-10 training-prep surface: properties the hash oracle can't see
  * — bloom no-false-negatives, global line-dedup invariants, packing
  * bin-budget arithmetic, split determinism/disjointness.
  */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-prefiltered semi join is exactly the plain semi join") {
    val probe = (1L to 5000L).map(i => (i, i % 97)).toDF("k", "v")
    val keys = (1L to 5000L).filter(_ % 13 == 0).map(Tuple1(_)).toDF("kk")
    val pruned = BloomPrefilter.semiJoinPruned(probe, "k", keys, "kk",
      expectedItems = 1000L, numBits = 1 << 16)
    val plain = probe.join(keys, col("k") === col("kk"), "left_semi")
    assert(pruned.orderBy("k").collect().toSeq ==
      plain.orderBy("k").collect().toSeq)
  }

  test("bloom prefilter prunes most non-matching probe rows") {
    // FPP sanity at a size where the prune matters: ~385 keys in 64k
    // bits, 50k probes — survivors must be ≈ matches, not ≈ probes
    val probe = (1L to 50000L).map(Tuple1(_)).toDF("k")
    val keys = (1L to 50000L).filter(_ % 130 == 0).map(Tuple1(_)).toDF("kk")
    val bloom = BloomPrefilter.buildBloom(keys, "kk", 1000L, 1 << 16)
    val kept = probe.filter(BloomPrefilter.mightContain(bloom, col("k"))).count()
    val matches = 50000L / 130
    assert(kept >= matches, "bloom dropped a true match (false negative)")
    assert(kept <= matches + 2500,
      s"bloom kept $kept rows for $matches matches - FPP far above spec")
  }

  test("global line dedup: every surviving line is globally unique and first-occurrence") {
    val d = TrainPrep.dedupLinesGlobal(spark, sf)
    // re-derive the kept lines from the reassembled text: since lines
    // are fixed 16-word chunks and docs are reassembled in order, a
    // doc's text_dedup splits back into exactly n_kept chunks only if
    // ALL its lines are 16 words; tail chunks are shorter, so instead
    // pin the aggregate invariants:
    val rows = d.select("doc_id", "n_lines", "n_kept").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n, k) => k >= 1 && k <= n },
      "kept-line count out of range")
    // the boilerplate line is planted on EVERY doc; exactly one doc may
    // keep it, so total dropped >= docs - 1
    val docs = rows.length
    val dropped = rows.map { case (_, n, k) => n - k }.sum
    assert(dropped >= docs - 1, "shared boilerplate not deduplicated")
    // doc 0 (global minimum order key) must keep all its lines
    val d0 = rows.find(_._1 == 0L).get
    assert(d0._2 == d0._3, "doc 0 lost a line despite holding min order")
  }

  test("sequence packing: bins respect the running token budget within each stream") {
    val out = TrainPrep.packSequences(spark, sf)
      .select("lang", "shard", "bin", "tokens").as[(String, Long, Long, Long)]
      .collect().groupBy(t => (t._1, t._2))
    out.foreach { case ((lang, shard), bins) =>
      val sorted = bins.sortBy(_._3)
      // bins must be dense from 0 and each bin's START offset is within
      // budget of its index: cumulative tokens before bin b is >= b*2048
      // and the first doc of bin b starts < (b+1)*2048
      var cum = 0L
      sorted.foreach { case (_, _, bin, toks) =>
        assert(cum >= bin * 2048 || bin == 0,
          s"($lang,$shard) bin $bin starts before its budget boundary")
        assert(cum < (bin + 1) * 2048,
          s"($lang,$shard) bin $bin starts past its boundary")
        cum += toks
      }
    }
  }

  test("train/eval split is deterministic, disjoint, and exhaustive") {
    val a = TrainPrep.splitTrainEval(spark, sf).collect()
    val b = TrainPrep.splitTrainEval(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "split not reproducible")
    val total = a.map(_.getLong(2)).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs, "split lost or duplicated documents")
  }

  test("scratch-bounded chunked verify is pair-for-pair identical to the one-shot verify") {
    import graft.operators.NearDup
    // deterministic corpus of sorted long-hash sets spanning negative
    // AND positive values (the chunk rotation case: signed sort order
    // visits unsigned-top-bit chunks as C/2..C-1, 0..C/2-1)
    val rnd = new scala.util.Random(7)
    val docs = (0L until 40L).map { i =>
      val base = Array.fill(60 + rnd.nextInt(40))(rnd.nextLong())
      // plant overlap: every doc shares a common block with doc i-1
      val shared = Array.tabulate(50)(k => (i / 2) * 1000003L + k * 7919L - 25 * 7919L)
      (i, (base ++ shared).distinct.sorted)
    }
    val hs = docs.toDF("id", "gh")
    val cand = (for { a <- 0L until 40L; b <- (a + 1) until 40L }
      yield (a, b)).toDF("a", "b")
    def canonPairs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("a", "b").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val oneShot = canonPairs(
      NearDup.verifyJaccard(cand, hs, threshold = 0.2, shardWidth = 4))
    val chunked = canonPairs(
      NearDup.verifyJaccardChunked(cand, hs, threshold = 0.2, chunks = 4,
        shardWidth = 4))
    assert(oneShot.nonEmpty, "planted overlap produced no verified pairs")
    assert(chunked == oneShot)
    // ...and at a different chunk width (odd split points)
    val chunked8 = canonPairs(
      NearDup.verifyJaccardChunked(cand, hs, threshold = 0.2, chunks = 8,
        shardWidth = 4))
    assert(chunked8 == oneShot)
  }

  test("chunk windows: coverage, overlap, boundaries, short-doc identity") {
    val out = TrainPrep.chunkOverlapWindows(spark, sf)
      .collect().groupBy(_.getLong(0))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == docs.keySet, "every document chunks")
    out.foreach { case (id, chunks) =>
      val toks = docs(id).split(" ", -1)
      val sorted = chunks.sortBy(_.getInt(1))
      // chunk i is exactly tokens [24i, 24i+32)
      sorted.foreach { r =>
        val s = r.getInt(1) * 24
        assert(r.getString(2) == toks.slice(s, s + 32).mkString(" "))
        assert(r.getInt(3) == math.min(32, toks.length - s))
      }
      // count: one chunk per stride start, final tokens covered
      val expectChunks = math.max(0, (toks.length - 32 + 23) / 24) + 1
      assert(sorted.length == expectChunks, s"doc $id")
      // ≤32-token docs are their own single chunk
      if (toks.length <= 32)
        assert(sorted.length == 1 && sorted.head.getString(2) == docs(id))
      // consecutive chunks overlap by 8 tokens
      if (sorted.length > 1)
        assert(sorted(0).getString(2).split(" ").drop(24).toSeq ==
          sorted(1).getString(2).split(" ").take(8).toSeq)
    }
  }

  test("scd2 merge: changed keys get exactly two versions, others one open row") {
    val out = Joins.mergeScd2(spark, sf)
    val byKey = out.groupBy("c_custkey").agg(
      count(lit(1)).as("versions"),
      sum(when(col("is_current"), 1).otherwise(0)).as("open"))
    assert(byKey.filter(col("open") =!= 1).count() == 0,
      "every key must have exactly one current row")
    assert(byKey.filter(pmod(col("c_custkey"), lit(7)) === 0)
      .filter(col("versions") =!= 2).count() == 0)
    assert(byKey.filter(pmod(col("c_custkey"), lit(7)) =!= 0)
      .filter(col("versions") =!= 1).count() == 0)
  }
}
