package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Near-duplicate detection over a corpus of (id, text) — the LLM-data
  * dedup family (SURVEY.md §2.9): MinHash+LSH, SimHash blocking, and
  * exact n-gram Jaccard.
  *
  * Scale design: every method here reduces all-pairs O(n²) to
  * candidate generation via an equi-join on a bucket key (LSH band /
  * SimHash block / shared n-gram), which Spark executes as an ordinary
  * shuffle join — linear in corpus size plus output pairs. The exact
  * Jaccard verification then runs only on candidates. Skewed buckets
  * (stop-gram style) are the failure mode at 100 TB; `ngramJaccardPairs`
  * therefore drops grams above a document-frequency cap before joining.
  */
object NearDup {

  /** id + deduplicated word n-gram set per document (documents with
    * fewer than n words drop out — they have no n-gram signature).
    *
    * The corpus is repartitioned to full parallelism first: shingling
    * and minhashing are CPU-heavy narrow transforms, and a corpus read
    * from a few small files would otherwise run them on as few cores as
    * there are input splits (measured 16× slowdown at sf0.1, where the
    * fixture is a single parquet file).
    */
  private def gramSets(corpus: DataFrame, id: String, text: String, n: Int): DataFrame =
    corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(id).as("id"),
        array_distinct(wordNgrams(tokens(col(text)), n)).as("grams"))
      .filter(size(col("grams")) > 0)

  /** Exact n-gram Jaccard similarity join: pairs (a < b) with
    * |A∩B| / |A∪B| >= threshold. Candidates = pairs sharing at least one
    * gram (a pair with Jaccard >= t shares >= 1 gram, so this loses
    * nothing); grams with document frequency above `maxDf` are dropped
    * from candidate generation only — a stop-gram shared by half the
    * corpus generates O(n²) candidates while contributing almost no
    * Jaccard evidence.
    */
  def ngramJaccardPairs(corpus: DataFrame, id: String, text: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Long = 1000): DataFrame = {
    // cached: read by both posting-join sides and twice more in verify
    val g = gramSets(corpus, id, text, n).persist()
    // Candidate generation is all-scalar: the Σdf² posting self-join and
    // the pair dedup shuffle only (gram, id) rows. The ~50-element gram
    // arrays are attached afterwards, once per SURVIVING pair — carrying
    // them through the posting join was a 10× shuffle-bytes blowup at
    // sf0.1 (measured).
    // join on 64-bit gram hashes, not gram strings: ~20-char UTF8 keys
    // in a Σdf²-row shuffle are pure overhead, and a 64-bit collision
    // can only create a spurious CANDIDATE, which exact verification
    // then discards
    val posting = g.select(col("id"), explode(col("grams")).as("gram"))
      .select(col("id"), xxhash64(col("gram")).as("gram"))
    val rare = posting.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("gram")
    // persisted: both sides of the pair self-join read it, and the df
    // groupBy feeding it is itself a full posting shuffle
    val p = posting.join(rare, "gram").persist()
    // Count shared (rare) grams per pair instead of distinct-ing raw
    // collision rows: the groupBy gets map-side partial aggregation, and
    // the count is a LOWER BOUND on the true intersection (exact when
    // maxDf drops nothing), so thresholding it here prunes the pair set
    // to near-final size before any gram array is materialized.
    val sizes = g.select(col("id"), size(col("grams")).as("sz"))
    val interCounts = p.select(col("gram"), col("id").as("a"))
      .join(p.select(col("gram"), col("id").as("b")), "gram")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
    val candidates = interCounts
      .join(sizes.select(col("id").as("a"), col("sz").as("sa")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("sb")), "b")
      .filter(col("i").cast("double") /
        (col("sa") + col("sb") - col("i")).cast("double") >= threshold)
      .select("a", "b")
    verifyJaccard(candidates, g, threshold)
  }

  /** Attach gram sets to candidate (a, b) pairs and keep those with
    * exact Jaccard >= threshold.
    */
  private def verifyJaccard(candidates: DataFrame, gramSets: DataFrame,
      threshold: Double): DataFrame =
    candidates
      .join(gramSets.select(col("id").as("a"), col("grams").as("ga")), "a")
      .join(gramSets.select(col("id").as("b"), col("grams").as("gb")), "b")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("ga")) + size(col("gb")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))

  /** MinHash signature: for each of k hash functions, the minimum
    * rehashed gram hash. Grams are hashed to 64 bits ONCE, then each of
    * the k "permutations" rehashes the long with the permutation index —
    * 8-byte hashing per (gram, k) instead of re-hashing a ~20-char
    * string k times (~3× cheaper, measured).
    */
  def minHashSignature(grams: Column, k: Int): Column = {
    val baseHashes = transform(grams, g => xxhash64(g))
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(baseHashes, h => xxhash64(h, s))))
  }

  /** MinHash + LSH banding near-dup join: k = bands * rowsPerBand
    * hashes; candidates collide on at least one band; every candidate is
    * verified with exact Jaccard >= threshold. With b bands of r rows the
    * collision probability is 1-(1-j^r)^b — b=8, r=4 gives the classic
    * S-curve centered near j≈0.6.
    */
  def minHashLshPairs(corpus: DataFrame, id: String, text: String,
      n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    // cached: read by both banding-join sides and twice more in verify
    val g = gramSets(corpus, id, text, n).persist()
    // Banding join is all-scalar (band, bucket, id); gram arrays join in
    // only for verification of surviving candidates (see
    // ngramJaccardPairs for the rationale).
    val banded = g
      .withColumn("sig", minHashSignature(col("grams"), bands * rowsPerBand))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
              x => x.cast("string")))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val candidates = banded.select(col("band"), col("bucket"), col("id").as("a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("b")),
        Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    verifyJaccard(candidates, g, threshold)
  }

  /** SimHash near-dup join: 61-bit signatures, candidates generated by
    * equality on one of four 16-bit blocks (pigeonhole: hamming <= 3
    * pairs must agree on at least one block), verified by exact hamming
    * <= maxHamming.
    */
  def simHashPairs(corpus: DataFrame, id: String, text: String,
      maxHamming: Int = 3): DataFrame = {
    val blocks = 4
    val s = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(id).as("id"), simHash(tokens(col(text))).as("sig"))
      .withColumn("block", explode(transform(sequence(lit(0), lit(blocks - 1)),
        b => struct(b.as("block_id"),
          call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xFFFF).as("block_val")))))
      .select(col("id"), col("sig"), col("block.block_id"), col("block.block_val"))
    s.select(col("block_id"), col("block_val"), col("id").as("a"), col("sig").as("siga"))
      .join(s.select(col("block_id"), col("block_val"), col("id").as("b"), col("sig").as("sigb")),
        Seq("block_id", "block_val"))
      .filter(col("a") < col("b"))
      .select("a", "b", "siga", "sigb").distinct()
      .withColumn("hamming", hamming(col("siga"), col("sigb")))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }
}
