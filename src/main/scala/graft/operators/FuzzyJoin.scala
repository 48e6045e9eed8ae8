package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity join with q-gram blocking —
  * fuzzy string matching without a cartesian product.
  *
  * The naive form compares every string pair (O(n²) Levenshtein
  * evaluations — a cluster-killer on any real vocabulary). The
  * standard filter-verify decomposition used here:
  *
  *  1. BLOCK: explode each string into its distinct positional-free
  *     q-grams and equi-join on the gram, so only pairs sharing at
  *     least one q-gram ever meet. Completeness is the q-gram count
  *     bound (Gravano et al., VLDB'01): strings with edit distance
  *     ≤ d share ≥ max(|a|,|b|) − q + 1 − d·q common q-grams, which is
  *     ≥ 1 whenever max(|a|,|b|) ≥ q·(d+1) + q − 1. Pairs where BOTH
  *     strings are shorter than that floor can share zero q-grams at
  *     distance d, so the (tiny, bounded) short-string stratum joins
  *     all-pairs within itself and against everything in the length
  *     band instead — correctness never depends on data luck.
  *  2. PRUNE: the length band ||a|−|b|| ≤ d (edit distance is at least
  *     the length difference) filters candidates before dedup.
  *  3. VERIFY: one `levenshtein()` call per surviving DISTINCT pair
  *     (Spark's built-in is codegen'd), keeping pairs with distance
  *     ≤ d.
  *
  * Scale shape: every stage is an equi-shuffle on gram or pair keys —
  * the same bucketed discipline as the n-gram near-dup family
  * (NearDup.scala); gram-frequency skew (a stopword-gram shared by
  * half the corpus) surfaces as key skew that AQE splits. The
  * candidate count is Σ_gram df², so a pre-filter dropping ultra-
  * frequent grams is the PPJoin-style refinement when vocabularies
  * grow — not needed at the current fixture scale and deliberately
  * not pre-built (the prefix machinery lives in NearDup when it is).
  */
object FuzzyJoin {

  /** Self-join: (a, b) pairs of distinct values of `strCol` with
    * `levenshtein(a, b) <= maxDist`, a < b lexicographically so each
    * pair appears once. Input rows are deduplicated on `strCol` first —
    * fuzzy matching is a vocabulary operation; callers fan results back
    * to rows by joining on the string.
    */
  def levenshteinSelfJoin(df: DataFrame, strCol: String, maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1 && q >= 1)
    // below this, distance-d pairs may share zero q-grams
    val gramFloor = q * (maxDist + 1) + q - 1
    val vocab = df.select(col(strCol).as("s")).filter(col("s").isNotNull)
      .distinct()
      .withColumn("len", length(col("s")))
    val long = vocab.filter(col("len") >= gramFloor)
    val short = vocab.filter(col("len") < gramFloor)

    def grams(side: DataFrame, sn: String, ln: String): DataFrame = side
      .select(col("s").as(sn), col("len").as(ln),
        explode(array_distinct(expr(
          s"transform(sequence(1, len - ${q - 1}), i -> substr(s, i, $q))")))
          .as("g"))
    val gramPairs = grams(long, "a", "la")
      .join(grams(long, "b", "lb"), Seq("g"))
      .filter(col("a") < col("b") &&
        abs(col("la") - col("lb")) <= maxDist)
      .select("a", "b").distinct()
    // short stratum: short×(short ∪ length-band long) all-pairs,
    // canonicalized via least/greatest (a one-sided cross only carries
    // one orientation, so an `a < b` filter alone would drop pairs
    // where the long string sorts first). Bounded: the short vocabulary
    // is tiny by construction and the long side is length-banded first.
    val other = short.unionByName(
      long.filter(col("len") < gramFloor + maxDist))
    val shortPairs = short.select(col("s").as("x"), col("len").as("lx"))
      .crossJoin(other.select(col("s").as("y"), col("len").as("ly")))
      .filter(col("x") =!= col("y") && abs(col("lx") - col("ly")) <= maxDist)
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
    gramPairs.unionByName(shortPairs).distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= maxDist)
  }
}
