package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicate-SPAN removal: any `w`-token window that occurs more
  * than once in the corpus is removed from every occurrence except the
  * globally first (min (doc, pos)) — the token-level substring-dedup
  * discipline of Lee et al., "Deduplicating Training Data Makes
  * Language Models Better" (suffix-array exact substring dedup),
  * re-expressed relationally so it distributes:
  *
  *  1. window explode: every token position `p` emits its `w`-token
  *     gram — zero shuffle, output ∝ corpus tokens;
  *  2. gram stats: ONE groupBy on the gram → (min occurrence key, df).
  *     `min`/`count` are map-side combinable, so a boilerplate gram
  *     occurring in every document collapses in the partial aggregate —
  *     the skew never crosses the wire;
  *  3. mark: join occurrences back to stats ON the same gram key —
  *     Catalyst reuses the aggregate's hash partitioning, and skewed
  *     grams fan IN (df probe rows × 1 stats row), not out. Non-first
  *     duplicate occurrences become removal intervals [p, p+w);
  *  4. coverage: per doc, ONE sort-based window over the union of token
  *     rows and interval rows — running `max(end)` over positions ≤ p
  *     tells whether token p is inside any interval. No interval×token
  *     range join, no per-interval re-explode: overlapping spans (the
  *     common case — a duplicated run of L > w tokens yields L−w+1
  *     overlapping marks) cost one window row each, so a
  *     fully-duplicated corpus still merges in linear time;
  *  5. reassemble surviving tokens in order per doc.
  *
  * The occurrence key is id·2^20 + p — exact BIGINT lexicographic
  * (id, pos) order while positions stay < 2^20 and ids < 2^43 (longer
  * docs / wider id spaces widen the shift or switch to a struct min —
  * same plan). At 100 TB the gram STRINGS are the dominant shuffle mass
  * (~w× corpus bytes into stage 2); `fingerprintGrams = true` ships
  * 8-byte xxhash64(gram) fingerprints through the stats aggregate and
  * the mark join instead, accepting ~2⁻⁶⁴ per-pair collision odds —
  * the plan is IDENTICAL, only the key column narrows. The declared
  * query keeps strings (exact removal set, SQL-oracle-replayable); the
  * stress harness measures the fingerprint arm.
  */
object SpanDedup {

  /** @param docs  one row per document
    * @param idCol numeric (long-castable) unique document id
    * @param textCol single-space-tokenized text
    * @param w    span width in tokens
    * @param fingerprintGrams key stage 2/3 on xxhash64(gram) (the
    *        100 TB shuffle-mass regime) instead of the gram string
    * @return (idCol, n_tokens, n_removed, text_clean), one row per doc
    */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int, fingerprintGrams: Boolean = false): DataFrame = {
    require(w >= 2, s"span width must be >= 2, got $w")
    val toks = docs
      .select(col(idCol), split(col(textCol), " ").as("__words"))
      // loud contract guard: a doc longer than 2^20 tokens or an id
      // outside [0, 2^43) would silently corrupt the packed (id, pos)
      // key's keep-first arbitration — fail from the executor that
      // meets the violation instead
      .withColumn("__n",
        when(size(col("__words")) > (1 << 20) ||
            col(idCol).cast("long") < 0 ||
            col(idCol).cast("long") >= (1L << 43),
          raise_error(concat(lit("span dedup: doc "), col(idCol).cast("string"),
            lit(" violates the packed-key contract (pos < 2^20, 0 <= id < 2^43)"))
            .cast("int")))
          .otherwise(size(col("__words"))))
      // force the guard in a SHARED ancestor of both downstream branches
      // (occ prunes __n via its own >= w filter, but tokenRows would
      // column-prune __n away entirely — this tautological filter pins
      // the raise_error into every doc's path regardless of branch;
      // size() is never negative, but Catalyst can't fold that)
      .filter(col("__n") >= 0)
    val gramExpr = (p: Column) => {
      val g = array_join(slice(col("__words"), p + 1, lit(w)), " ")
      if (fingerprintGrams) xxhash64(g) else g
    }
    val occ = toks.filter(col("__n") >= w)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__n") - w), gramExpr)))
      .toDF(idCol, "p", "gram")
      .withColumn("key", col(idCol).cast("long") * lit(1048576L) + col("p"))
    val stats = occ.groupBy("gram")
      .agg(min("key").as("min_key"), count(lit(1)).as("df"))
    val marks = occ.join(stats, "gram")
      .filter(col("df") > 1 && col("key") =!= col("min_key"))
      .select(col(idCol), col("p").cast("long").as("p"), lit(0).as("kind"),
        lit(null).cast("string").as("tok"),
        (col("p") + w).cast("long").as("span_end"))
    val tokenRows = toks
      .select(col(idCol), posexplode(col("__words")))
      .toDF(idCol, "p", "tok")
      .select(col(idCol), col("p").cast("long").as("p"), lit(1).as("kind"),
        col("tok"), lit(null).cast("long").as("span_end"))
    val win = Window.partitionBy(idCol).orderBy("p", "kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokenRows.unionByName(marks)
      .withColumn("cov_end", max("span_end").over(win))
      .filter(col("kind") === 1)
      .withColumn("removed", coalesce(col("cov_end") > col("p"), lit(false)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("removed"), 1L).otherwise(0L)).as("n_removed"),
        coalesce(array_join(transform(
          array_sort(collect_list(when(!col("removed"),
            struct(col("p"), col("tok"))))),
          x => x.getField("tok")), " "), lit("")).as("text_clean"))
  }
}
