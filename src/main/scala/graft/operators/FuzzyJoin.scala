package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity join with prefix-filtered
  * q-gram blocking — fuzzy string matching without a cartesian product.
  *
  * The naive form compares every string pair (O(n²) Levenshtein
  * evaluations — a cluster-killer on any real vocabulary). The
  * filter-verify decomposition used here:
  *
  *  1. BLOCK on a rarest-gram PREFIX (Ed-Join, Xiao et al. VLDB'08):
  *     explode each string into its distinct q-grams, rank them under a
  *     global rarity order (document frequency, gram tiebreak), and
  *     keep only the first `q·d + 1` as the string's blocking prefix.
  *     One edit destroys at most q distinct grams, so ed(a,b) ≤ d ⇒
  *     |G(a) ∩ G(b)| ≥ |G(a)| − d·q — the classic prefix principle then
  *     guarantees two such strings share at least one gram within each
  *     other's (d·q + 1)-gram prefixes. Candidates = Σ_gram df_prefix²
  *     over the RAREST grams only, which is what keeps the join alive
  *     when a stopword-gram's raw df goes corpus-scale (blocking on all
  *     grams is Σ df² over "er"/"th"-class grams — quadratic in
  *     practice; the same rarest-first discipline as NearDup's PPJoin
  *     prefix).
  *  2. PRUNE: the length band ||a|−|b|| ≤ d (edit distance is at least
  *     the length difference) filters candidates before dedup.
  *  3. VERIFY: one `levenshtein()` call per surviving DISTINCT pair
  *     (Spark's built-in is codegen'd), keeping pairs with distance
  *     ≤ d.
  *
  * Completeness floor: the prefix/count bound needs max(|a|,|b|) ≥
  * q·(d+1) + q − 1 (shorter strings can share zero q-grams at distance
  * d). Pairs where BOTH strings sit under that floor go through a
  * (tiny, bounded, length-banded) all-pairs short stratum instead —
  * correctness never depends on data luck.
  *
  * Scale shape: every stage is an equi-shuffle on gram or pair keys —
  * the df rank is one count aggregate plus a per-string window over
  * ≤ |s| gram rows; residual prefix-gram skew surfaces as key skew
  * that AQE splits.
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
    import org.apache.spark.sql.expressions.Window
    require(maxDist >= 1 && q >= 1)
    // below this, distance-d pairs may share zero q-grams
    val gramFloor = q * (maxDist + 1) + q - 1
    val prefLen = q * maxDist + 1
    val vocab = df.select(col(strCol).as("s")).filter(col("s").isNotNull)
      .distinct()
      .withColumn("len", length(col("s")))
    val long = vocab.filter(col("len") >= gramFloor)
    val short = vocab.filter(col("len") < gramFloor)

    val grams = long.select(col("s"), col("len"),
      explode(array_distinct(expr(
        s"transform(sequence(1, len - ${q - 1}), i -> substr(s, i, $q))")))
        .as("g"))
    val gdf = grams.groupBy("g").agg(count(lit(1)).as("df"))
    // rarest-first rank within each string; df ties broken by the gram
    // itself so the global order is identical across strings
    val byRarity = Window.partitionBy("s").orderBy(col("df"), col("g"))
    val prefix = grams.join(gdf, "g")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= prefLen)
      .select("s", "len", "g")
    val gramPairs = prefix
      .select(col("g"), col("s").as("a"), col("len").as("la"))
      .join(prefix.select(col("g"), col("s").as("b"), col("len").as("lb")),
        Seq("g"))
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
