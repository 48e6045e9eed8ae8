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
  * d). Sub-floor strings do NOT fall back to all-pairs (natural
  * vocabularies are mostly sub-floor words at q=2, d=2 — an all-pairs
  * short stratum is quadratic exactly where the data is densest).
  * Instead the short stratum re-runs the SAME prefix machinery at
  * q = 1: one edit touches one position, so it removes at most one
  * distinct character, and the (d+1)-rarest-character prefixes of two
  * strings within distance d must intersect whenever each side has
  * more than d distinct characters. Only strings with ≤ d DISTINCT
  * characters ("aa", "abab", …) fall to a micro all-pairs stratum —
  * combinatorially tiny for any real charset and independent of
  * vocabulary size.
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
    require(maxDist >= 1 && q >= 1)
    // below this, distance-d pairs may share zero q-grams
    val gramFloor = q * (maxDist + 1) + q - 1
    val vocab = df.select(col(strCol).as("s")).filter(col("s").isNotNull)
      .distinct()
      .withColumn("len", length(col("s")))
    val long = vocab.filter(col("len") >= gramFloor)
    val gramPairs = prefixCandidates(long, q, maxDist)

    // Short stratum: the same rarest-gram prefix filter at q = 1. One
    // edit touches one position, so it removes at most one DISTINCT
    // character; the (d+1)-rarest-char prefixes of two strings within
    // distance d must share a char whenever each side has > d distinct
    // characters. Boundary-long strings (len < gramFloor + d) join the
    // stratum so short×long cross-floor pairs are blocked too (pairs
    // among them are also found by the q-gram path; the final distinct
    // dedups). Natural-language short words (most of a real vocabulary
    // at q=2, d=2) block on their rare characters instead of
    // cross-joining — the stratum is corpus-linear, not quadratic.
    val shortSide = vocab.filter(col("len") < gramFloor + maxDist)
      .withColumn("nd", size(array_distinct(expr(
        "transform(sequence(1, len), i -> substr(s, i, 1))"))))
    val blocked = shortSide.filter(col("nd") > maxDist).drop("nd")
    val charPairs = prefixCandidates(blocked, 1, maxDist)
    // Micro stratum: strings with ≤ d distinct characters ("aa",
    // "abab") can lose their whole character set in d edits, so no
    // prefix bound applies. All-pairs against the length-banded short
    // side, canonicalized via least/greatest (a one-sided cross only
    // carries one orientation, so an `a < b` filter alone would drop
    // pairs where the right side sorts first). Bounded: ≤ d distinct
    // chars under the gram floor is a combinatorial constant of the
    // charset, independent of vocabulary size.
    val micro = shortSide.filter(col("nd") <= maxDist).drop("nd")
    val microPairs = micro.select(col("s").as("x"), col("len").as("lx"))
      .crossJoin(shortSide.select(col("s").as("y"), col("len").as("ly")))
      .filter(col("x") =!= col("y") && abs(col("lx") - col("ly")) <= maxDist)
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
    gramPairs.unionByName(charPairs).unionByName(microPairs).distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= maxDist)
  }

  /** Fuzzy self-join under Jaro–Winkler similarity ≥ `minSim` over the
    * distinct values of `strCol`, with RAREST-TOKEN PREFIX blocking —
    * the Ed-Join prefix discipline of [[levenshteinSelfJoin]] lifted
    * from q-grams to whitespace tokens. Emits (a, b, jw), a < b.
    *
    * Candidate generation: explode each name into its DISTINCT tokens,
    * rank tokens by global rarity (document frequency, token tiebreak
    * — the identical total order on every name), and block each name
    * on only its `tokenDiff + 1` RAREST tokens. By the prefix
    * principle, two names whose token sets intersect in at least
    * max(|A|,|B|) − tokenDiff tokens MUST share a token within these
    * prefixes — so the blocking is lossless under the vocabulary-class
    * assumption that qualifying pairs disagree in at most `tokenDiff`
    * tokens per side (JW is a character measure, so this is a
    * per-vocabulary contract, not a theorem; the all-pairs recall spec
    * pins it on the fixture vocabulary, and callers tune `tokenDiff`
    * for theirs). What the prefix buys at scale is exactly what it
    * buys Ed-Join: candidate volume is Σ df_prefix² over the RAREST
    * tokens only, so a stopword-class token ("premium", "standard")
    * with corpus-scale df falls out of every prefix that has anything
    * rarer — the Σ df² explosion of all-shared-token blocking (the
    * round-12 `weak` flag) cannot happen through a common token unless
    * a name has NOTHING rarer. Names with ≤ tokenDiff + 1 tokens keep
    * all their tokens (the prefix is the whole set — blocking is then
    * exactly shared-token, and the quadratic guard is the rarity
    * ORDER: the shared token that forms a block is the rarest
    * available one).
    *
    * Two further prunes are PROVABLE from the kernel (no assumption):
    *  - Jaro floor: the Winkler boost is +l·0.1·(1−j) with l ≤ 4 and
    *    only fires above j = 0.7, so jw ≥ θ forces
    *    j ≥ min(θ, (θ − 0.4)/0.6).
    *  - Length band: matches are injective, m ≤ min(|a|,|b|), and
    *    j ≤ (m/|a| + m/|b| + 1)/3, so j ≥ jFloor forces
    *    min(|a|,|b|) ≥ (3·jFloor − 2)·max(|a|,|b|) — applied BEFORE
    *    the candidate distinct, cutting the shuffle volume; pairs it
    *    drops provably cannot pass the final filter.
    *
    * Verify: one codegen'd
    * [[org.apache.spark.sql.graft.JaroWinkler]] evaluation per
    * surviving distinct pair.
    */
  def jaroWinklerSelfJoin(df: DataFrame, strCol: String, minSim: Double,
      tokenDiff: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minSim > 0.0 && minSim <= 1.0, s"minSim in (0,1]; got $minSim")
    require(tokenDiff >= 0)
    val jFloor = math.min(minSim, (minSim - 0.4) / 0.6)
    val band = math.max(3 * jFloor - 2, 0.0)
    val vocab = df.select(col(strCol).as("name"))
      .filter(col("name").isNotNull).distinct()
      .withColumn("len", length(col("name")))
    val toks = vocab.select(col("name"), col("len"),
      explode(array_distinct(split(col("name"), " "))).as("t"))
    val tdf = toks.groupBy("t").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("name").orderBy(col("df"), col("t"))
    val prefix = toks.join(tdf, "t")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= tokenDiff + 1)
      .select("name", "len", "t")
    prefix.select(col("t"), col("name").as("a"), col("len").as("la"))
      .join(prefix.select(col("t"), col("name").as("b"), col("len").as("lb")),
        Seq("t"))
      .filter(col("a") < col("b") &&
        least(col("la"), col("lb")).cast("double") >=
          greatest(col("la"), col("lb")) * band)
      .select("a", "b").distinct()
      .withColumn("jw",
        org.apache.spark.sql.graft.JaroWinkler.columnFor(col("a"), col("b")))
      .filter(col("jw") >= minSim)
  }

  /** Rarest-gram-prefix candidate pairs over `vocab` (cols `s`, `len`)
    * at gram width `q`: explode distinct q-grams, rank by global rarity
    * (document frequency, gram tiebreak), self-join on the first
    * `q·d + 1` grams, length-band prune. Sound for strings with more
    * than `q·d` distinct q-grams — the caller owns routing strings
    * below that floor elsewhere.
    */
  private def prefixCandidates(vocab: DataFrame, q: Int, maxDist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prefLen = q * maxDist + 1
    val grams = vocab.select(col("s"), col("len"),
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
    prefix
      .select(col("g"), col("s").as("a"), col("len").as("la"))
      .join(prefix.select(col("g"), col("s").as("b"), col("len").as("lb")),
        Seq("g"))
      .filter(col("a") < col("b") &&
        abs(col("la") - col("lb")) <= maxDist)
      .select("a", "b").distinct()
  }
}
