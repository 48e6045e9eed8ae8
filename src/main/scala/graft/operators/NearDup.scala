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
  * therefore self-joins only rarity-ordered PREFIX postings (exact, per
  * the prefix-filtering principle) with PPJoin's positional-filter
  * count bound, so high-df stop-grams never enter the pair join at all.
  *
  * Cache lifecycle: each operator persists its heavy intermediate
  * (gram-set / signature frame) for the duration of ONE materializing
  * action and releases it via [[CacheLifecycle.releaseAfterAction]] —
  * repeated invocations in a long-lived session leave no dead blocks.
  * Consequence for callers: MATERIALIZE THE RESULT ONCE. The first
  * completed action releases the intermediates, so a second action on
  * the same returned DataFrame (e.g. `count()` then `write`) silently
  * recomputes the whole candidate+verify pipeline. A multi-action
  * consumer should persist the returned frame itself (or write it out
  * and re-read) before fanning out.
  */
object NearDup {

  /** Spread a narrow-but-CPU-heavy transform across all cores: a corpus
    * read from a few small files would otherwise shingle/hash on as few
    * cores as there are input splits (measured 16× slowdown at sf0.1,
    * where the fixture is a single parquet file). The repartition is
    * CONDITIONAL on two plan-only checks (never an action):
    *  - a corpus whose lineage already contains a shuffle arrives at
    *    ~spark.sql.shuffle.partitions parallelism, and inspecting its
    *    partition count via `.rdd` would eagerly execute every upstream
    *    stage under AQE — skip both the probe and the repartition;
    *  - a pure scan lineage exposes its split count cheaply (`.rdd` on
    *    an exchange-free plan runs no jobs); repartition only when the
    *    splits can't feed every core.
    */
  private def withFullParallelism(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val target = corpus.sparkSession.sparkContext.defaultParallelism
    val shuffled = corpus.queryExecution.optimizedPlan.find {
      case _: Join | _: Aggregate | _: Distinct | _: Window | _: Sort => true
      case _: Repartition | _: RepartitionByExpression | _: GlobalLimit => true
      case _ => false
    }.isDefined
    if (shuffled || corpus.rdd.getNumPartitions >= target) corpus
    else corpus.repartition(target)
  }

  /** id + deduplicated word n-gram set per document (documents with
    * fewer than n words drop out — they have no n-gram signature).
    */
  private def gramSets(corpus: DataFrame, id: String, text: String, n: Int): DataFrame =
    withFullParallelism(corpus)
      .select(col(id).as("id"),
        graft.functions.FastText.ngramSet(col(text), n).as("grams"))
      .filter(size(col("grams")) > 0)

  /** id + SORTED 64-bit gram-hash set per document — the form the
    * posting build AND the verify stage consume. Hashing at the source
    * (instead of after the posting explode) means gram STRINGS never
    * enter a shuffle or a persisted frame on the exact-Jaccard path:
    * at 64× stress scale the verify join's per-pair payload of two
    * gram-string arrays was the measured spill cliff (STRESS.md), and
    * sorted long arrays are ~5× smaller and merge-scannable. Same
    * xxhash64 the posting previously applied post-explode, so candidate
    * generation is bit-identical; a cross-gram collision inside one
    * pair's union (~2⁻⁵⁰) is the only way hash Jaccard can differ from
    * string Jaccard.
    */
  private def gramHashSets(corpus: DataFrame, id: String, text: String,
      n: Int): DataFrame =
    withFullParallelism(corpus)
      .select(col(id).as("id"),
        graft.functions.FastText.ngramHashSet(col(text), n).as("gh"))
      .filter(size(col("gh")) > 0)

  /** Exact n-gram Jaccard similarity join: pairs (a < b) with
    * |A∩B| / |A∪B| >= threshold.
    *
    * Candidate generation uses PREFIX FILTERING with PPJoin's
    * positional filter (Bayardo et al. "Scaling Up All Pairs Similarity
    * Search", WWW'07; Xiao et al. PPJoin, WWW'08):
    *
    *  1. Order every document's grams by global rarity (ascending
    *     document frequency, gram hash as tie-break — one total order
    *     shared by all documents). If J(A,B) >= t, A and B must share a
    *     gram inside each one's first |x| - ceil(t*|x|) + 1 grams, so
    *     joining only the prefix postings is EXACT (zero recall loss)
    *     while excluding precisely the high-df stop-grams whose
    *     Sum(df^2) blowup dominates a naive posting self-join.
    *  2. PPJoin's INDEX-TIME filter (the round-8 64×-residual fix): the
    *     join is asymmetric — the larger document's full PROBING prefix
    *     (|x| - ceil(t|x|) + 1) meets only the smaller document's
    *     INDEXING prefix (|x| - ceil(2t/(1+t)|x|) + 1). For any pair
    *     with sb <= sa the overlap threshold α = ceil(t/(1+t)(sa+sb))
    *     satisfies α >= t·sa (length filter below) and α >= 2t/(1+t)·sb,
    *     so the α-th-from-last shared gram sits inside BOTH prefixes —
    *     still zero recall loss, with ~1.8× fewer candidate-orientation
    *     rows at t=0.8 (the measured 64× shuffle-spill cliff, STRESS.md).
    *  3. A length filter (t*|a| <= |b| <= |a|, by orientation) prunes
    *     collisions before any per-pair state accumulates.
    *  4. Per candidate pair, one groupBy (map-side partial agg — no
    *     wide `distinct`) folds every matched orientation row into TWO
    *     overlap bounds, and prunes on their minimum:
    *      - count bound: c shared prefix grams at maximum matched
    *        rarity ranks (ia, jb). Both gram lists are sorted by the
    *        SAME total order, so shared grams match monotonically and
    *        every shared gram beyond the counted ones ranks after ia
    *        in A and after jb in B: |A∩B| <= c + min(|A|-ia, |B|-jb).
    *      - positional bound (PPJoin's in-posting-list filter): a match
    *        at ranks (ra, rb) bounds the pair's whole overlap by
    *        min(ra,rb) + min(sa-ra, sb-rb) (shared grams globally
    *        before the match rank < both; after it, > both) — each
    *        row's bound holds for the pair, so min over rows holds.
    *        This stays tight exactly where the index-time filter (item
    *        2) loosens the count bound: with the indexing prefix
    *        shortened, c and jb shrink together and c + (sb - jb)
    *        admits pairs sharing one rare gram plus a long slack tail.
    *     Pairs whose combined bound can't reach t are pruned HERE — the
    *     verify join sees a near-final pair set instead of every pair
    *     sharing a single prefix gram (the round-2 mistake: that was a
    *     3× regression at sf0.1).
    */
  def ngramJaccardPairs(corpus: DataFrame, id: String, text: String,
      n: Int = 3, threshold: Double = 0.5,
      verifyBroadcast: Boolean = false): DataFrame =
    ngramJaccardCore(corpus, id, text, n, threshold, (a, b) => a < b,
      verifyBroadcast, (_, _) => lit(true))

  /** Cross-corpus exact n-gram Jaccard join: pairs (left_id, right_id,
    * jaccard) with J >= threshold, left from `left`, right from `right`
    * — the "dedup a new batch against an existing reference corpus"
    * shape (same-side pairs are NOT emitted; use [[ngramJaccardPairs]]
    * on one corpus for those). Runs the identical prefix-filter +
    * positional-filter machinery over the tagged union: the rarity
    * order is global across both sides, and prefix filtering is exact
    * for any pair regardless of which side its members come from.
    */
  def ngramJaccardJoin(left: DataFrame, right: DataFrame, id: String,
      text: String, n: Int = 3, threshold: Double = 0.5): DataFrame =
    ngramJaccardCore(taggedUnion(left, right, id, text), "__doc", "__text",
      n, threshold, (a, b) => a.getField("s") < b.getField("s"),
      verifyBroadcast = false,
      (a, b) => a.getField("s") =!= b.getField("s"))
      .select(col("a.i").as("left_id"), col("b.i").as("right_id"), col("jaccard"))

  /** Shared PPJoin pipeline. Candidate ORIENTATION is internal — the
    * index side of each unordered pair is the smaller (size, key) — so
    * two predicates parameterize the variants: `candidateKeep(a, b)` is
    * the SYMMETRIC admission filter applied at candidate time (self-
    * join: all pairs; cross-corpus: sides differ), and
    * `pairPredicate(a, b)` states the OUTPUT orientation, applied by
    * re-ordering each verified pair at the end (self-join: a < b;
    * cross-corpus: left side first).
    */
  private def ngramJaccardCore(corpus: DataFrame, id: String, text: String,
      n: Int, threshold: Double,
      pairPredicate: (Column, Column) => Column,
      verifyBroadcast: Boolean,
      candidateKeep: (Column, Column) => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cached: read by the posting build and twice more in verify.
    // Hash-set form throughout — gram strings never leave the scan
    // projection (see gramHashSets; the 64× verify-spill fix).
    val g = gramHashSets(corpus, id, text, n).persist()
    val posting = g.select(col("id"), size(col("gh")).as("sz"),
        explode(col("gh")).as("gram"))
    val df = posting.groupBy("gram").agg(count(lit(1)).as("df"))
    // rarest-first rank of each gram within its document; ties broken by
    // the gram hash so the global order is consistent across documents
    val byRarity = Window.partitionBy("id").orderBy(col("df"), col("gram"))
    // persisted: both sides of the pair join read it, and the df join +
    // per-document rank sort feeding it are themselves shuffles. Holds
    // the PROBING prefix; the index side filters it further below.
    val prefix = posting.join(df, "gram")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select("id", "sz", "gram", "rn").persist()
    // EAGER cache fill, one bounded job: the probe and index sides both
    // scan this cache; filling it under ONE job (before the release
    // listener registers, so it can neither release nor miss-expire the
    // cache) keeps the expensive posting + df-join + rank-window
    // upstream from ever racing between the two consumer exchanges
    // below. Laziness is traded away exactly once, like the other
    // documented eager builds (scan_jdbc_partitioned, indexed PPJoin).
    prefix.count()
    // The pair join below is the EXPANSION point: tiny input (prefix
    // postings, ~100s of MB), huge in-stage output (candidate
    // orientation rows). AQE sizes shuffle coalescing by INPUT bytes,
    // so left to itself it coalesces the join's exchanges down to
    // ~defaultParallelism fat partitions — each task's partial
    // aggregation then overflows its hash table and falls back to
    // sort-spill, emitting near-unaggregated output (measured at 32×
    // stress: 33-task stage, 10 GB spill, 7.9 GB of partial-agg shuffle
    // instead of ~0.1, 5-8× whole-query wall time). Both sides
    // therefore repartition by the join key at an EXPLICIT width (AQE
    // never re-coalesces user repartitions with explicit N; the
    // repartitions must sit on the JOIN side of the cache, because a
    // cached plan reports unknown partitioning to consumers): the join
    // then needs no exchange of its own and runs statically wide, sized
    // for its OUTPUT. The width reuses the session's
    // initialPartitionNum (the "size for the largest shuffle" knob) —
    // oversizing costs empty-task scheduling; undersizing costs the
    // spill above.
    val pairWidth = {
      val conf = corpus.sparkSession.conf
      conf.getOption("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
        .flatMap(_.toIntOption)
        .getOrElse(conf.get("spark.sql.shuffle.partitions").toInt)
    }
    // Index-time filter (doc item 2): the index side keeps only the
    // first sz - ceil(2t/(1+t)*sz) + 1 grams. The 1e-9 guards the
    // unsafe float-ceil direction — an overestimated ceil would SHORTEN
    // the prefix (recall loss); under-biasing can only lengthen it (a
    // few extra candidates, all killed by verify).
    val idxFactor = 2 * threshold / (1 + threshold)
    val indexSide = prefix
      .filter(col("rn") <= col("sz") - ceil(col("sz") * idxFactor - lit(1e-9)) + 1)
      .select(col("gram"), col("id").as("b"), col("sz").as("sb"),
        col("rn").as("rb"))
      .repartition(pairWidth, col("gram"))
    // exactly one orientation per unordered pair: index = smaller
    // (size, key); strictness also excludes a==b
    val orientation = col("sb") < col("sa") ||
      (col("sb") === col("sa") && col("b") < col("a"))
    // in-posting-list positional prune (doc item 3): one row bounds the
    // whole pair's overlap, map-side, before the groupBy shuffle
    val ubRow = least(col("ra"), col("rb")) +
      least(col("sa") - col("ra"), col("sb") - col("rb"))
    val candidates = prefix.select(col("gram"), col("id").as("a"),
        col("sz").as("sa"), col("rn").as("ra"))
      .repartition(pairWidth, col("gram"))
      .join(indexSide, "gram")
      // NO per-row ubRow filter here: a pair is prunable only when the
      // bound over its WHOLE row set fails, and rows must reach the
      // aggregate for min("ubr") below to see them (a row filter would
      // guarantee every surviving row passes, making the min a no-op —
      // and rows it drops cost nothing downstream anyway, since the
      // map-side partial agg compresses rows to pair states before
      // anything shuffles)
      .filter(orientation && candidateKeep(col("a"), col("b")) &&
        // length filter; sa >= t*sb is implied by sb <= sa, t <= 1
        col("sb") >= col("sa") * threshold)
      .withColumn("ubr", ubRow)
      .groupBy("a", "b", "sa", "sb")
      .agg(count(lit(1)).as("c"), max("ra").as("ia"), max("rb").as("jb"),
        // every row's positional bound is valid for the whole pair, so
        // their MINIMUM is too — and it stays tight where the count
        // bound below went loose when the index-time filter shortened
        // the indexing prefix (c and jb shrink together there, so
        // c + (sb - jb) alone admits pairs sharing one rare gram plus a
        // long tail of slack; measured at 32× stress: the loose bound
        // fed a spilling fat-array verify shuffle)
        min("ubr").as("ubr"))
      .withColumn("ub",
        least(col("c") + least(col("sa") - col("ia"), col("sb") - col("jb")),
          col("ubr")))
      // ub <= min(sa, sb), so the union denominator stays positive
      .filter(col("ub").cast("double") /
        (col("sa") + col("sb") - col("ub")).cast("double") >= threshold)
      .select("a", "b")
    // verified pairs carry the internal (probe, index) orientation;
    // restore the caller's output order
    val verified = verifyJaccard(candidates, g, threshold, verifyBroadcast,
      pairWidth)
    val oriented = verified.select(
      when(pairPredicate(col("a"), col("b")), col("a")).otherwise(col("b")).as("a"),
      when(pairPredicate(col("a"), col("b")), col("b")).otherwise(col("a")).as("b"),
      col("jaccard"))
    CacheLifecycle.releaseAfterAction(oriented, Seq(g, prefix))
  }

  /** Attach SORTED gram-hash sets to candidate (a, b) pairs and keep
    * those with exact Jaccard >= threshold. `hashSets` must expose
    * (id, gh: sorted array<long>).
    *
    * Two physical strategies, same answer:
    *  - `bcast = false` (default): two shuffle joins. Right when the
    *    CORPUS is the big thing — the doc→hash-set table shards across
    *    the cluster and each pair meets its arrays where they live.
    *    Cost: the pair rows carry one array through the second shuffle
    *    (~pairs × array bytes of shuffle I/O).
    *  - `bcast = true`: broadcast the doc→hash-set table; both joins
    *    become map-side hash lookups and only the SKINNY (a, b) pairs
    *    ever shuffle. Right in the pairs ≫ docs regime (dup-heavy
    *    corpora, stress replication: 10.6M pairs vs 320k docs at 64× —
    *    the measured ~30 GB verify spill collapses to the ~160 MB pair
    *    shuffle). The caller asserts the corpus-linear table fits the
    *    executors (it is NOT probed here — probing would break the
    *    lazy-build contract).
    */
  private def verifyJaccard(candidates: DataFrame, hashSets: DataFrame,
      threshold: Double, bcast: Boolean = false,
      pairWidth: Int = 0): DataFrame = {
    // jaccard is one imperative kernel call (sorted-merge scan), NOT an
    // array_intersect expression chain: Catalyst pushes the threshold
    // filter into the join condition, where an interpreted
    // array_intersect was evaluated several times per matched pair
    // (measured: it dominated the whole query; the kernel is ~µs/pair).
    // Long-hash arrays instead of gram strings keep the per-pair join
    // payload ~5× smaller — the 64× stress spill lived here.
    def side(alias: String, arr: String) = {
      val s = hashSets.select(col("id").as(alias), col("gh").as(arr))
      if (bcast) broadcast(s) else
        // pin the verify joins at the candidate join's explicit width:
        // their inputs are small (skinny pairs + the doc table), so AQE
        // coalesces the ENSURE_REQUIREMENTS exchanges down to
        // ~defaultParallelism — but the mid-verify payload EXPANDS
        // (each pair picks up a gram-hash array), and the fat
        // (a, b, ga)-by-b sort then spills everything it writes
        // (measured at 32× stress: 33 tasks, 7.3 GB written, 7.3 GB
        // spilled, ~60 s of the whole query's wall time). Same
        // size-by-output-not-input reasoning as the candidate join.
        if (pairWidth > 0) s.repartition(pairWidth, col(alias)) else s
    }
    val mid = candidates
      .join(side("a", "ga"), "a")
    val fat = if (bcast || pairWidth <= 0) mid
      else mid.repartition(pairWidth, col("b"))
    fat
      .join(side("b", "gb"), "b")
      .withColumn("jaccard", graft.functions.FastText.jaccardHash(col("ga"), col("gb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Broadcast-index PPJoin: the same EXACT prefix-filter + positional-
    * filter + verify semantics as [[ngramJaccardPairs]], executed as a
    * map-side probe against a broadcast in-memory index instead of a
    * posting self-join + groupBy. Zero shuffle after the corpus scan:
    * candidate ORIENTATION rows (the measured 64×-stress disk cliff —
    * tens of GB of (gram, a, b, rank) traffic through one box) never
    * exist as rows at all; each task accumulates its docs' candidates
    * in a per-doc hash map and verifies inline.
    *
    * The trade is explicit and the caller's: the index (rarity-ordered
    * prefix postings + full sorted hash arrays, flat primitive arrays)
    * is corpus-linear and must fit the driver and each executor
    * (~0.5 GB at 64× stress = 320k docs; the same pairs ≫ docs regime
    * where `verifyBroadcast` applies). The build is EAGER (one collect
    * at call time — same documented lazy-contract departure as
    * `scan_jdbc_partitioned`). The sharded [[ngramJaccardPairs]] is the
    * right path when the corpus itself outgrows executor memory.
    *
    * Result parity with the shuffle path is spec-asserted pair-for-pair
    * including the jaccard values (same rarity order, same positional
    * bound, same verify kernel semantics, same HALF_UP rounding).
    */
  def ngramJaccardPairsIndexed(corpus: DataFrame, id: String, text: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = gramHashSets(corpus, id, text, n)
      .as[(Long, Array[Long])].collect()
    val m = rows.length
    val ids = new Array[Long](m)
    val full = new Array[Array[Long]](m)   // hash-sorted (verify form)
    val pref = new Array[Array[Long]](m)   // rarity-ordered prefix grams
    // global document frequency of every gram hash
    val dfm = scala.collection.mutable.LongMap.empty[Int]
    rows.foreach { case (_, gh) =>
      gh.foreach(g => dfm(g) = dfm.getOrElse(g, 0) + 1)
    }
    var i = 0
    var totalP = 0
    while (i < m) {
      val (idv, gh) = rows(i)
      ids(i) = idv; full(i) = gh
      val sz = gh.length
      val pl = sz - math.ceil(sz * threshold).toInt + 1
      // candidate state packs (c:20 | ia:22 | jb:22) bits below; every
      // field is <= the prefix length, so an oversized document must
      // fail LOUDLY here rather than silently corrupt the packed
      // positional bound (which could wrongly prune true pairs)
      require(pl <= 0xFFFFF,
        s"ngramJaccardPairsIndexed: document $idv has a prefix of $pl grams " +
          s"(> 2^20-1); the packed candidate state cannot represent it — " +
          s"use the shuffle path ngramJaccardPairs for this corpus")
      // the shared total order of the distributed path: (df asc, hash asc)
      pref(i) = gh.sortBy(g => (dfm(g), g)).take(pl)
      totalP += pl
      i += 1
    }
    // inverted prefix index over flat arrays: (gram, docIdx, 1-based rank)
    // sorted by gram, range-located by binary search
    val order = new Array[Int](totalP)
    val pg = new Array[Long](totalP)
    val pd = new Array[Int](totalP)
    val pr = new Array[Int](totalP)
    var k = 0
    i = 0
    while (i < m) {
      val p = pref(i); var j = 0
      while (j < p.length) { pg(k) = p(j); pd(k) = i; pr(k) = j + 1; k += 1; j += 1 }
      i += 1
    }
    java.util.Arrays.setAll(order, (x: Int) => x)
    val boxed = order.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, (x: Integer, y: Integer) =>
      java.lang.Long.compare(pg(x), pg(y)))
    val sg = new Array[Long](totalP); val sd = new Array[Int](totalP)
    val sr = new Array[Int](totalP)
    k = 0
    while (k < totalP) {
      val o = boxed(k); sg(k) = pg(o); sd(k) = pd(o); sr(k) = pr(o); k += 1
    }
    val bc = spark.sparkContext.broadcast((ids, full, pref, sg, sd, sr))
    val t = threshold
    val out = spark.sparkContext
      .parallelize(0 until m, spark.sparkContext.defaultParallelism)
      .mapPartitions { docs =>
        val (bIds, bFull, bPref, bSg, bSd, bSr) = bc.value
        val total = bSg.length
        docs.flatMap { a =>
          val sa = bFull(a).length
          val pa = bPref(a)
          // bIdx -> packed (c:20 | ia:22 | jb:22); ranks are 1-based
          val cand = scala.collection.mutable.LongMap.empty[Long]
          var ii = 0
          while (ii < pa.length) {
            val g = pa(ii)
            // binary search the first posting of g
            var lo = 0; var hi = total
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (bSg(mid) < g) lo = mid + 1 else hi = mid
            }
            while (lo < total && bSg(lo) == g) {
              val b = bSd(lo)
              val sb = bFull(b).length
              if (bIds(b) > bIds(a) && sb >= sa * t && sa >= sb * t) {
                val prev = cand.getOrElse(b.toLong, 0L)
                val c = (prev >>> 44) + 1
                val ia = math.max((prev >>> 22) & 0x3FFFFF, (ii + 1).toLong)
                val jb = math.max(prev & 0x3FFFFF, bSr(lo).toLong)
                cand(b.toLong) = (c << 44) | (ia << 22) | jb
              }
              lo += 1
            }
            ii += 1
          }
          cand.iterator.flatMap { case (bL, packed) =>
            val b = bL.toInt
            val sb = bFull(b).length
            val c = packed >>> 44
            val ia = (packed >>> 22) & 0x3FFFFF
            val jb = packed & 0x3FFFFF
            val ub = c + math.min(sa - ia, sb - jb)
            if (ub.toDouble / (sa + sb - ub).toDouble >= t) {
              // sorted-merge intersection on the full hash arrays — the
              // same count the jaccard_hash_sets kernel computes
              val ga = bFull(a); val gb = bFull(b)
              var x = 0; var y = 0; var inter = 0
              while (x < ga.length && y < gb.length) {
                if (ga(x) == gb(y)) { inter += 1; x += 1; y += 1 }
                else if (ga(x) < gb(y)) x += 1
                else y += 1
              }
              val j = inter.toDouble / (sa + sb - inter).toDouble
              if (j >= t)
                // Catalyst's Round(double) goes through BigDecimal
                // .valueOf (canonical string repr), NOT the exact
                // binary constructor — match it or near-tie values
                // round differently than the DF path
                Some((bIds(a), bIds(b),
                  java.math.BigDecimal.valueOf(j)
                    .setScale(4, java.math.RoundingMode.HALF_UP)
                    .doubleValue()))
              else None
            } else None
          }
        }
      }
    out.toDF("a", "b", "jaccard")
  }

  /** MinHash + LSH banding near-dup join: k = bands * rowsPerBand
    * hashes; candidates collide on at least one band; every candidate is
    * verified with exact Jaccard >= threshold. With b bands of r rows the
    * collision probability is 1-(1-j^r)^b — b=8, r=4 gives the classic
    * S-curve centered near j≈0.6.
    */
  def minHashLshPairs(corpus: DataFrame, id: String, text: String,
      n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5, verifyBroadcast: Boolean = false): DataFrame =
    minHashCore(corpus, id, text, n, bands, rowsPerBand, threshold,
      (a, b) => a < b, verifyBroadcast)

  /** Cross-corpus MinHash+LSH near-dup join — the approximate analogue
    * of [[ngramJaccardJoin]] (same banding candidates + exact-Jaccard
    * verification; only cross-side pairs are emitted).
    */
  def minHashLshJoin(left: DataFrame, right: DataFrame, id: String,
      text: String, n: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame =
    minHashCore(taggedUnion(left, right, id, text), "__doc", "__text",
      n, bands, rowsPerBand, threshold, (a, b) => a.getField("s") < b.getField("s"))
      .select(col("a.i").as("left_id"), col("b.i").as("right_id"), col("jaccard"))

  private def minHashCore(corpus: DataFrame, id: String, text: String,
      n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      pairPredicate: (Column, Column) => Column,
      verifyBroadcast: Boolean = false): DataFrame = {
    // cached: read by both banding-join sides and twice more in verify.
    // Carries BOTH forms: gram strings feed the banding kernel (keeps
    // signatures bit-identical to the spec'd constants), sorted hashes
    // feed verify (the pair-join payload — see gramHashSets). The cache
    // is corpus-sized; only the skinny gh column rides the pair join.
    val g = gramSets(corpus, id, text, n)
      .withColumn("gh", array_sort(transform(col("grams"), x => xxhash64(x))))
      .persist()
    // Banding join is all-scalar (band, bucket, id); hash arrays join in
    // only for verification of surviving candidates (see
    // ngramJaccardPairs for the rationale). Signature + banding is one
    // imperative kernel call per document (see FastText.lshBandBuckets).
    val banded = g
      .select(col("id"), posexplode(
        graft.functions.FastText.lshBandBuckets(col("grams"), bands, rowsPerBand)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val candidates = banded.select(col("band"), col("bucket"), col("id").as("a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("b")),
        Seq("band", "bucket"))
      .filter(pairPredicate(col("a"), col("b")))
      .select("a", "b").distinct()
    CacheLifecycle.releaseAfterAction(
      verifyJaccard(candidates, g.select(col("id"), col("gh")), threshold,
        verifyBroadcast), Seq(g))
  }

  /** Side-tagged union for the cross-corpus joins: composite doc key
    * struct(side, id) so ids may collide across corpora, and the pair
    * predicate can require strictly increasing side.
    */
  private def taggedUnion(left: DataFrame, right: DataFrame, id: String,
      text: String): DataFrame = {
    def tag(df: DataFrame, side: Int) = df.select(
      struct(lit(side).as("s"), col(id).as("i")).as("__doc"),
      col(text).as("__text"))
    tag(left, 0).unionByName(tag(right, 1))
  }

  /** SimHash near-dup join: 61-bit signatures, candidates generated by
    * equality on one of four 16-bit blocks (pigeonhole: hamming <= 3
    * pairs must agree on at least one block), verified by exact hamming
    * <= maxHamming.
    */
  def simHashPairs(corpus: DataFrame, id: String, text: String,
      maxHamming: Int = 3): DataFrame =
    simHashCore(corpus, id, text, maxHamming, (a, b) => a < b)

  /** Cross-corpus SimHash near-dup join (only cross-side pairs; same
    * pigeonhole candidates + exact hamming verification).
    */
  def simHashJoin(left: DataFrame, right: DataFrame, id: String,
      text: String, maxHamming: Int = 3): DataFrame =
    simHashCore(taggedUnion(left, right, id, text), "__doc", "__text",
      maxHamming, (a, b) => a.getField("s") < b.getField("s"))
      .select(col("a.i").as("left_id"), col("b.i").as("right_id"), col("hamming"))

  private def simHashCore(corpus: DataFrame, id: String, text: String,
      maxHamming: Int, pairPredicate: (Column, Column) => Column): DataFrame = {
    val blocks = 4
    // persisted: both sides of the block self-join read it — without
    // this the tokenize + SimHash64 pass runs twice
    val s = withFullParallelism(corpus)
      .select(col(id).as("id"), simHash(tokens(col(text))).as("sig"))
      .withColumn("block", explode(transform(sequence(lit(0), lit(blocks - 1)),
        b => struct(b.as("block_id"),
          call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xFFFF).as("block_val")))))
      .select(col("id"), col("sig"), col("block.block_id"), col("block.block_val"))
      .persist()
    val pairs = s
      .select(col("block_id"), col("block_val"), col("id").as("a"), col("sig").as("siga"))
      .join(s.select(col("block_id"), col("block_val"), col("id").as("b"), col("sig").as("sigb")),
        Seq("block_id", "block_val"))
      .filter(pairPredicate(col("a"), col("b")))
      .select("a", "b", "siga", "sigb").distinct()
      .withColumn("hamming", hamming(col("siga"), col("sigb")))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
    CacheLifecycle.releaseAfterAction(pairs, Seq(s))
  }
}
