package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{JaccardHashSets, JaccardSets, LshBandBuckets, NgramHashSet, NgramSet}

/** Column façade over the native codegen kernels for the compute-heavy
  * inner loops of near-dup detection (shingling, set intersection,
  * minhash signatures) — see
  * [[org.apache.spark.sql.graft.FastTextKernels]].
  *
  * History: rounds 1-3 shipped these as Scala UDFs after measuring the
  * HOF formulations (`transform`/`slice`/`concat_ws` chains) at ~0.6 ms
  * per 54-word document — interpreted evaluation dominated every
  * shuffle of the near-dup join combined. Round 4 ported the UDFs to
  * native expressions (the SimHash64 pattern): same kernels, but no
  * CatalystTypeConverters on either side and no codegen fence, which
  * was the top remaining constant factor on the widest column at
  * 100 TB. Semantics are unchanged and pinned in FastTextSpec
  * (lowercase, java-regex \s+ split, drop empties, space-joined
  * n-grams, first-occurrence-order distinct; null text ≡ no grams).
  */
object FastText {

  /** Distinct space-joined word n-grams; empty when fewer than n tokens.
    * Equality with the expression pipeline
    * `array_distinct(wordNgrams(tokens(text), n))` is asserted in
    * FastTextSpec, including null / whitespace / unicode edge cases.
    */
  def ngramSet(text: Column, n: Int): Column = NgramSet.columnFor(text, n)

  /** Sorted distinct xxhash64 gram-hash set in one kernel pass — the
    * fused `array_sort(transform(ngramSet(text, n), xxhash64))` without
    * materializing the gram-string array (the exact-dedup scale path).
    */
  def ngramHashSet(text: Column, n: Int): Column = NgramHashSet.columnFor(text, n)

  /** Exact Jaccard of two string sets (arrays assumed deduplicated;
    * never null — null inputs count as empty sets).
    */
  def jaccard(a: Column, b: Column): Column = JaccardSets.columnFor(a, b)

  /** Exact Jaccard of two SORTED long-hash sets (sorted-merge scan;
    * never null). The verify-stage scale path: same value as [[jaccard]]
    * on the hashed sets, ~5× smaller join payload.
    */
  def jaccardHash(a: Column, b: Column): Column = JaccardHashSets.columnFor(a, b)

  /** LSH band buckets from a minhash signature of bands*rowsPerBand
    * permutations: element b = hash of rows [b*r, (b+1)*r) of the
    * signature (hash each gram once, remix per permutation — signatures
    * bit-identical to the round-3 UDF).
    */
  def lshBandBuckets(grams: Column, bands: Int, rowsPerBand: Int): Column =
    LshBandBuckets.columnFor(grams, bands, rowsPerBand)
}
