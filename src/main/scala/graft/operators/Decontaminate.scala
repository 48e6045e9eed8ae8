package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{tokens, wordNgrams}

/** Benchmark decontamination: find (or drop) training documents that
  * share any word n-gram with an evaluation/benchmark set (SURVEY.md
  * §2.9 — the contamination check every LLM training pipeline runs
  * before a corpus ships; n = 8..13 in published recipes).
  *
  * Scale shape at 100 TB: the BENCHMARK side is small (eval suites are
  * MBs) and the CORPUS side is the 100 TB. The benchmark's distinct
  * grams therefore broadcast, the corpus explodes its grams inside a
  * single map stage ending in a BroadcastHashJoin — the exploded corpus
  * NEVER shuffles — and only the matches (rare by construction) reach
  * the per-document aggregation. One linear pass over the corpus, a
  * shuffle proportional to the contamination, not the corpus.
  *
  * Grams join as exact strings, not hashes: the broadcast side is small
  * enough that hashing buys nothing, and string equality keeps the
  * result exactly reproducible by any engine (no collision caveat).
  */
object Decontaminate {

  private def distinctGrams(df: DataFrame, text: String, n: Int): Column =
    array_distinct(wordNgrams(tokens(col(text)), n))

  /** Per contaminated document: how many of its distinct n-grams appear
    * anywhere in the benchmark. Only documents with >= 1 hit are
    * returned (id, n_hits).
    */
  def hits(corpus: DataFrame, benchmark: DataFrame, id: String,
      text: String, benchText: String, n: Int = 13): DataFrame = {
    val benchGrams = benchmark
      .select(explode(distinctGrams(benchmark, benchText, n)).as("gram"))
      .distinct()
    // the gram explode is the CPU-heavy narrow stage; a fixture-sized
    // parquet input arrives in one or two partitions and would run it
    // nearly serially (same rationale as NearDup's repartition-first)
    val target = corpus.sparkSession.sparkContext.defaultParallelism
    val wide =
      if (corpus.rdd.getNumPartitions >= target) corpus
      else corpus.repartition(target)
    wide
      .select(col(id).as("id"), explode(distinctGrams(wide, text, n)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy("id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The corpus with contaminated documents removed (left-anti join
    * against [[hits]] — the shuffle side is the hit set, so the anti
    * join broadcasts when contamination is small, the usual case).
    */
  def clean(corpus: DataFrame, benchmark: DataFrame, id: String,
      text: String, benchText: String, n: Int = 13): DataFrame = {
    val h = hits(corpus, benchmark, id, text, benchText, n)
    // no broadcast hint: the hit set's size is data-dependent (tiny in
    // the normal case, unbounded for a poisoned corpus) — AQE converts
    // the anti join to broadcast at runtime when it measures small
    corpus.join(h.select(col("id").as(id)), Seq(id), "left_anti")
  }
}
