package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Imperative kernels for the compute-heavy inner loops of near-dup
  * detection (shingling, set intersection, minhash signatures).
  *
  * Rationale: these transforms are per-row CPU kernels, not relational
  * logic. The HOF formulations (`transform`/`slice`/`concat_ws` chains)
  * evaluate INTERPRETED in Spark — measured ~0.6 ms per 54-word document
  * at sf0.1, i.e. the shingling pass cost more than every shuffle of the
  * near-dup join combined. A plain Scala kernel is ~100× faster and, as
  * a narrow map after a 2-column scan, loses nothing to the optimizer
  * barrier: no predicate or projection needs to cross it. (SURVEY.md
  * §2.10 maps Dask's `map_partitions` to exactly this escape hatch.)
  *
  * Semantics are pinned to the declared-query oracle: lowercase,
  * whitespace-split (java regex \s+, ASCII class — matches DuckDB
  * string_split_regex '\s+'), drop empties, space-joined n-grams,
  * first-occurrence-order distinct.
  */
object FastText {

  private val Ws = "\\s+".r.pattern

  // null-safe: Spark passes null String inputs straight into UDFs; an
  // empty token array reproduces the expression pipeline's behavior
  // (null rows fall out of the downstream size(grams) > 0 filter)
  private def splitLower(text: String): Array[String] =
    if (text == null) Array.empty[String]
    else Ws.split(text.toLowerCase).filter(_.nonEmpty)

  /** Distinct space-joined word n-grams; empty when fewer than n tokens.
    * Equality with the expression pipeline
    * `array_distinct(wordNgrams(tokens(text), n))` is asserted in
    * FastTextSpec, including null / whitespace / unicode edge cases.
    */
  def ngramSet(text: Column, n: Int): Column = ngramSetUdf(text, lit0(n))
  private val ngramSetUdf = udf { (s: String, n: Int) =>
    val t = splitLower(s)
    if (t.length < n) Array.empty[String]
    else {
      val seen = new java.util.LinkedHashSet[String](t.length * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= t.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(t(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[String](seen.size)
      seen.toArray(out)
    }
  }

  /** Exact Jaccard of two string sets (arrays assumed deduplicated). */
  def jaccard(a: Column, b: Column): Column = jaccardUdf(a, b)
  private val jaccardUdf = udf { (a0: Seq[String], b0: Seq[String]) =>
    val a = if (a0 == null) Seq.empty[String] else a0
    val b = if (b0 == null) Seq.empty[String] else b0
    if (a.isEmpty && b.isEmpty) 0.0
    else {
      val sa = a.toSet
      val inter = b.count(sa.contains)
      inter.toDouble / (a.size + b.size - inter).toDouble
    }
  }

  /** FNV-1a 64-bit string hash — the base gram hash for minhash. */
  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** splitmix64 finalizer — the per-permutation remix. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** LSH band buckets from a minhash signature of bands*rowsPerBand
    * permutations: element b = hash of rows [b*r, (b+1)*r) of the
    * signature. One kernel call replaces the k-permutation HOF chain
    * (hash each gram once, remix per permutation — O(grams*k) longs, no
    * allocation per element).
    */
  def lshBandBuckets(grams: Column, bands: Int, rowsPerBand: Int): Column =
    lshUdf(grams, lit0(bands), lit0(rowsPerBand))
  private val lshUdf = udf { (grams0: Seq[String], bands: Int, r: Int) =>
    val grams = if (grams0 == null) Seq.empty[String] else grams0
    val k = bands * r
    val sig = Array.fill(k)(Long.MaxValue)
    grams.foreach { g =>
      val base = fnv64(g)
      var i = 0
      while (i < k) {
        val h = mix(base ^ mix(i.toLong))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0xcbf29ce484222325L
      var i = b * r
      while (i < (b + 1) * r) { acc = mix(acc ^ sig(i)); i += 1 }
      out(b) = acc
      b += 1
    }
    out
  }

  private def lit0(i: Int): Column = org.apache.spark.sql.functions.lit(i)
}
