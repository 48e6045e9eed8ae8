package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-data pipelines (SURVEY.md §2.9),
  * built exclusively from codegen'd Catalyst expressions (split, HOFs,
  * xxhash64, regexp_*) — no UDFs, so column pruning and whole-stage
  * codegen survive and the per-row cost is a single streaming pass at
  * any scale.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empty strings removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Word n-grams as space-joined strings; empty array when the document
    * has fewer than n tokens.
    */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** BPE-ish tokenizer count: letter runs, digit runs, and single
    * punctuation marks each count as one token (a cheap stand-in for
    * subword vocab size, proportional for cost estimation).
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Fraction of tokens that are (English) function words. */
  def stopwordRatio(toks: Column): Column = {
    val sw = array(EnStopwords.map(lit): _*)
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Heuristic document-quality score in [0,1]: rewarded for natural
    * length and function-word density, penalized for punctuation soup.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val lenTerm = least(size(toks).cast("double") / 100.0, lit(1.0))
    least(lit(1.0), greatest(lit(0.0),
      lit(0.3) + lit(0.4) * lenTerm + lit(0.5) * stopwordRatio(toks) -
        lit(2.0) * punctRatio(text)))
  }

  /** Per-language function-word lists for the n-gram/stopword
    * language-ID heuristic.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "una", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "une", "dans", "que", "pour"),
    "zh" -> Seq("的", "是", "不", "我", "了", "在", "人", "有", "他", "这"))

  /** Marker-hit count for one language, via the one-pass codegen kernel
    * [[org.apache.spark.sql.graft.LangMarkerHits]]. Space-delimited
    * languages count whole-token matches; zh counts marker occurrences
    * as substrings of the raw text — real Chinese is written
    * unsegmented, so `tokens()` yields whole sentences and
    * token-equality against single-character markers would never fire
    * (hits 0 → prediction falls to 'und').
    */
  def langHits(text: Column, lang: String): Column = {
    val order = org.apache.spark.sql.graft.LangMarkerHits.Order
    val idx = order.indexOf(lang)
    require(idx >= 0, s"unknown lang $lang (have ${order.mkString(",")})")
    element_at(org.apache.spark.sql.graft.LangMarkerHits.columnFor(text), idx + 1)
  }

  /** HOF formulation of [[langHits]] — identical values (asserted in
    * FastTextSpec); kept as the portable reference implementation and
    * the template the DuckDB oracle mirrors.
    */
  def langHitsHof(text: Column, lang: String): Column =
    if (lang == "zh") {
      val low = lower(text)
      LangMarkers(lang).map(m =>
        ((length(low) - length(replace(low, lit(m), lit("")))) /
          lit(m.length)).cast("int"))
        .reduce(_ + _)
    } else {
      val markers = array(LangMarkers(lang).map(lit): _*)
      size(filter(tokens(text), t => array_contains(markers, t)))
    }

  /** Argmax over an already-materialized hits array (ties broken by the
    * fixed en > es > de > fr > zh preference order), with 'und' when no
    * marker fires. Callers should project [[langMarkerHits]] into a real
    * column first and pass that attribute here: the CASE chain
    * duplicates its input ~15× across conditional branches, and codegen
    * subexpression elimination deliberately skips conditional branches,
    * so handing it the kernel expression directly re-runs the kernel
    * per branch (measured ~1 ms/doc; over an attribute the duplicates
    * are free array reads). CollapseProject keeps the two-step shape:
    * it refuses to inline a non-cheap alias referenced more than once.
    */
  def langIdFromHits(h: Column): Column = {
    val order = org.apache.spark.sql.graft.LangMarkerHits.Order
    val best = order.zipWithIndex.map { case (l, i) =>
      struct(element_at(h, i + 1).as("hits"), lit(l).as("lang"))
    }.reduceLeft((a, b) => when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** All-language marker hit counts in [[langIdFromHits]]'s order — the
    * one-pass codegen kernel, exposed for the project-then-argmax shape.
    */
  def langMarkerHits(text: Column): Column =
    org.apache.spark.sql.graft.LangMarkerHits.columnFor(text)

  /** One-pass repetition counters [nTokens, nDistinct, topCount,
    * nBigrams, nDistinctBigrams] — native kernel, ≡ the HOF reference
    * (FastTextSpec).
    */
  def repetitionStats(text: Column): Column =
    org.apache.spark.sql.graft.RepetitionStats.columnFor(text)

  /** HOF reference formulation of [[repetitionStats]] (slow O(V·n)
    * path; retained for the equivalence spec).
    */
  def repetitionStatsHof(text: Column): Column = {
    val ws = tokens(text)
    val big = zip_with(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat(a, lit(" "), b))
    array(
      size(ws).cast("long"),
      size(array_distinct(ws)).cast("long"),
      coalesce(array_max(transform(array_distinct(ws),
        w => size(filter(ws, t => t === w)))), lit(0)).cast("long"),
      size(big).cast("long"),
      size(array_distinct(big)).cast("long"))
  }

  /** Predicted language directly from text — convenience form for
    * one-shot use; hot paths should materialize [[langMarkerHits]] and
    * use [[langIdFromHits]] (see that doc for why).
    */
  def langId(text: Column): Column = langIdFromHits(langMarkerHits(text))

  /** 61-bit SimHash over tokens, via the codegen'd native expression
    * [[org.apache.spark.sql.graft.SimHash64]] (bits 61..63 left clear so
    * the value stays a positive BIGINT on every engine).
    */
  def simHash(toks: Column): Column =
    org.apache.spark.sql.graft.SimHash64.columnFor(toks)

  /** HOF formulation of [[simHash]] — identical values (asserted in
    * SimHashSpec); kept as the portable reference implementation.
    * Per bit: majority vote of token-hash bits, weighted +1/-1.
    */
  def simHashHof(toks: Column, bits: Int = 61): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), bits),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(bits - 1)),
          i => when(call_function("getbit", xxhash64(t), i) === 1, 1L).otherwise(-1L)),
        (a, b) => a + b))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(bits - 1)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two SimHash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Unicode NFC normalization (codegen; JDK Normalizer) — canonicalize
    * composed/decomposed forms once at ingest so exact dedup, n-gram
    * matching, and tokenizer lookups see one byte form per text.
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graft.NfcNormalize.columnFor(text)

  /** Document fingerprint: minimum 64-bit hash over rolling k-word
    * windows (min-hash winnowing — stable under local edits away from
    * the minimizing window).
    */
  def rollingFingerprint(toks: Column, k: Int): Column =
    org.apache.spark.sql.graft.RollingFingerprint.columnFor(toks, k)

  /** HOF formulation of [[rollingFingerprint]] — identical values
    * (asserted in FastTextSpec); the portable reference implementation.
    */
  def rollingFingerprintHof(toks: Column, k: Int): Column =
    array_min(transform(wordNgrams(toks, k), g => xxhash64(g)))
}
