package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Greedy BPE-vocabulary token counting (r16 verdict #4): the packing /
  * mixing / budget family counts whitespace or regex tokens, but real
  * pipeline budgeting is merge-table-based — a document's cost is the
  * token count AFTER the vocabulary's merges apply. This kernel
  * implements a bounded merge-table greedy encode as ONE codegen'd
  * string-expression chain (no UDF), with a DuckDB twin generated from
  * the SAME merge list so the declared query hash-matches.
  *
  * Semantics — the cross-engine lattice, chosen so both engines run
  * the IDENTICAL operation list:
  *
  *  1. a word enters as space-delimited characters `" c a t "`;
  *  2. merges apply IN RANK ORDER; each merge `(l, r) → lr` replaces
  *     `" l r "` with `" lr "` via the engines' shared non-overlapping
  *     left-to-right `replace`, run TWICE — pass 1 cannot see an
  *     occurrence whose leading space the previous match consumed
  *     (`" x y x y "` leaves the 2nd), but after pass 1 every survivor
  *     is flanked by merged tokens, so its delimiters are intact and
  *     pass 2 takes ALL of them (two passes suffice for ANY run
  *     length — survivors of pass 1 are never adjacent);
  *  3. token count = delimiter count − 1.
  *
  * For a WELL-FORMED merge table (every multi-char part produced by an
  * earlier merge — the invariant BPE training guarantees and
  * [[Merges]] satisfies by construction), rank-order exhaustive
  * application equals the classical lowest-rank-present-pair loop:
  * applying merge k can only create tokens that participate in merges
  * ranked AFTER k, never resurrect an earlier pair (merges consume
  * bare parts and never emit them). Round17Spec replays the classical
  * loop over every distinct fixture word and pins the equality.
  *
  * Scale: the encode is ~2·|merges| string replaces per row — pay it
  * once per DISTINCT word (Heaps' law: vocabulary ≪ corpus), then join
  * counts back; the declared query does exactly that.
  */
object Bpe {

  /** Rank-ordered merge table: high-frequency English character pairs
    * (a fixed, deterministic stand-in for a trained vocabulary — the
    * plumbing, join shape and budget arithmetic are what the engine
    * owns; a real deployment broadcasts its trained table here).
    * Well-formedness: `th` (rank 1) before `(th,e)` (rank 2), `an`
    * (4) before `(an,d)` (5), `in` (3) before `(in,g)` (19); every
    * other part is a single character.
    */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("s", "t"), ("a", "r"), ("o", "u"),
    ("i", "s"), ("i", "t"), ("a", "l"), ("in", "g"), ("e", "d"),
    ("t", "o"), ("o", "f"), ("l", "e"), ("c", "o"))

  /** The encoded form of a lowercase [a-z]+ word: space-delimited
    * tokens with leading and trailing delimiters, e.g. `" th e "`.
    */
  def encode(word: Column): Column = encodeChain(word, Merges)

  /** delimiters − 1 over an encoded form — the one token-count
    * arithmetic both the chain and kernel paths share.
    */
  private def countTokens(enc: Column): Column =
    (length(enc) - length(replace(enc, lit(" "), lit("")))) - lit(1)

  /** BPE token count of a lowercase [a-z]+ word: delimiters − 1. */
  def tokenCount(word: Column): Column = countTokens(encode(word))

  /** DuckDB twin of [[encode]], generated from the SAME merge list. */
  def encodeSql(wordExpr: String): String =
    Merges.foldLeft(s"' ' || regexp_replace($wordExpr, '(.)', '\\1 ', 'g')") {
      case (e, (l, r)) =>
        s"replace(replace($e, ' $l $r ', ' $l$r '), ' $l $r ', ' $l$r ')"
    }

  /** DuckDB twin of [[tokenCount]]. */
  def tokenCountSql(wordExpr: String): String = {
    val e = encodeSql(wordExpr)
    s"len($e) - len(replace($e, ' ', '')) - 1"
  }

  // ---- round 18: real-vocabulary path (r17 verdict #1) ----

  /** Well-formedness check for an external merge table — the invariant
    * BPE TRAINING guarantees and everything downstream leans on: every
    * multi-char part of merge k must be the OUTPUT of an earlier merge
    * (merges consume bare parts and never emit them, so rank-order
    * exhaustive application ≡ the classical lowest-rank loop — the
    * kernel/chain equality the oracle rides). Also refuses empty parts,
    * parts containing the delimiter space, LEFT parts starting with `#`
    * (the merges.txt layout could not round-trip them — [[loadVocab]]'s
    * comment filter would eat the line; r18 review #7), and duplicate
    * pairs (a dup makes "the" rank of a pair ill-defined).
    *
    * SELF-pairs (l == r) ARE well-formed — real trained vocabularies
    * contain them (`l l`, `e e`) and the priority-merge KERNEL merges
    * them classically; only the replace-CHAIN phrasing refuses them
    * (see [[encodeChain]] — its two-pass argument needs l ≠ r).
    * "Single char" means one CODE POINT (an astral-plane char is two
    * UTF-16 units but one atomic unit of the classical char split).
    */
  def validateWellFormed(merges: Seq[(String, String)]): Unit = {
    require(merges.nonEmpty, "empty merge table")
    def oneCp(s: String) = s.codePointCount(0, s.length) == 1
    val produced = scala.collection.mutable.HashSet.empty[String]
    val seen = scala.collection.mutable.HashSet.empty[(String, String)]
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require(l.nonEmpty && r.nonEmpty, s"merge $i: empty part")
      require(!l.contains(' ') && !r.contains(' '),
        s"merge $i ('$l','$r'): parts must not contain the space delimiter")
      require(!l.startsWith("#"),
        s"merge $i ('$l','$r'): a left part starting with '#' cannot " +
          "round-trip through the merges.txt layout (comment prefix)")
      require(seen.add((l, r)), s"merge $i: duplicate pair ('$l','$r')")
      require(oneCp(l) || produced(l),
        s"merge $i: left part '$l' is multi-char but no earlier merge produces it")
      require(oneCp(r) || produced(r),
        s"merge $i: right part '$r' is multi-char but no earlier merge produces it")
      produced += l + r
    }
  }

  /** Load an external merge table: one `left right` pair per line, rank
    * = line order (the published `merges.txt` layout), `#`-prefixed
    * lines and blanks skipped. Validated well-formed before anything
    * encodes with it. Driver-side read — a vocabulary is bounded
    * metadata (32k–100k short lines), broadcast with the plan, never a
    * distributed scan.
    */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    val merges = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(" ")
        require(parts.length == 2,
          s"malformed merge line (want 'left right'): '$l'")
        (parts(0), parts(1))
      }
    validateWellFormed(merges)
    merges
  }

  /** Write a merge table in the [[loadVocab]] layout. */
  def saveVocab(spark: org.apache.spark.sql.SparkSession, path: String,
      merges: Seq[(String, String)]): Unit = {
    validateWellFormed(merges)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(merges.map { case (l, r) => s"$l $r" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Classical greedy BPE TRAINING over a weighted distinct-word list:
    * each round merges the corpus's most frequent adjacent token pair
    * (count, then lexicographic tie-break — fully deterministic),
    * producing a table well-formed BY CONSTRUCTION (every new token is
    * a round's merge output), so [[validateWellFormed]] accepts it and
    * the kernel/chain equality holds. Driver-side by design: training
    * input is the DISTINCT-word frame with counts — vocabulary-sized
    * (Heaps' law), i.e. bounded metadata exactly like the loaded table
    * itself — collected once, never the corpus. Stops early when no
    * adjacent pair remains. Cost O(nMerges · Σ word lengths).
    *
    * `allowSelfPairs = false` skips l == r candidates — the tables the
    * replace-CHAIN phrasing (and with it a SQL oracle twin) can
    * express; the default trains unrestricted, as real BPE does, for
    * the kernel path.
    */
  def trainVocab(weightedWords: Seq[(String, Long)],
      nMerges: Int, allowSelfPairs: Boolean = true): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    // code-point split, matching the kernel (a surrogate pair is one
    // atomic unit of the classical char split)
    var toks: Array[(Array[String], Long)] = weightedWords
      .map { case (w, c) =>
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), c)
      }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      toks.foreach { case (ts, c) =>
        var i = 0
        while (i < ts.length - 1) {
          counts.updateWith((ts(i), ts(i + 1)))(v => Some(v.getOrElse(0L) + c))
          i += 1
        }
      }
      val eligible =
        if (allowSelfPairs) counts
        else counts.filter { case ((l, r), _) => l != r }
      if (eligible.isEmpty) exhausted = true
      else {
        val best = eligible.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        val (l, r) = best
        toks = toks.map { case (ts, c) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < ts.length) {
            if (i + 1 < ts.length && ts(i) == l && ts(i + 1) == r) {
              out += l + r; i += 2
            } else { out += ts(i); i += 1 }
          }
          (out.result(), c)
        }
        round += 1
      }
    }
    merges.result()
  }

  /** The replace chain over an ARBITRARY well-formed table — [[encode]]
    * generalized from the shipped [[Merges]]; kept for chain-vs-kernel
    * A/B measurement (Stress) and as the oracle-twin generator.
    *
    * REFUSES self-pairs (l == r): the chain's two-passes-suffice
    * argument ("pass-1 survivors are never adjacent") is FALSE for a
    * self-pair — on `" a a a a a "` the first pass's delimiter
    * consumption pairs (1,2)(4,5) where the classical loop (and the
    * kernel) pairs (1,2)(3,4), and at run length 6 even the token
    * COUNTS diverge (r18 review #1). A self-pair table is still valid —
    * encode it with [[encodeFast]]; it just has no faithful
    * replace-chain phrasing, in Spark or in the SQL oracle.
    */
  def encodeChain(word: Column, merges: Seq[(String, String)]): Column = {
    validateWellFormed(merges)
    merges.zipWithIndex.find { case ((l, r), _) => l == r }.foreach {
      case ((l, _), i) => throw new IllegalArgumentException(
        s"merge $i ('$l','$l') is a self-pair: the replace chain cannot " +
          "express classical self-pair merging — use encodeFast (the " +
          "priority-merge kernel) for this table")
    }
    val spaced = concat(lit(" "), regexp_replace(word, "(.)", "$1 "))
    merges.foldLeft(spaced) { case (c, (l, r)) =>
      val pat = lit(s" $l $r ")
      val rep = lit(s" $l$r ")
      replace(replace(c, pat, rep), pat, rep)
    }
  }

  /** Single-pass priority-merge encode
    * ([[org.apache.spark.sql.graft.BpePriorityEncode]]): same output as
    * [[encode]] on any well-formed table, O(word²) per word INDEPENDENT
    * of |merges| — the shape a real 32k-merge vocabulary needs. The
    * declared queries run this with the default [[Merges]] while their
    * oracles keep the chain twin, so the cross-engine hash gate
    * re-proves kernel ≡ chain every round.
    */
  def encodeFast(word: Column,
      merges: Seq[(String, String)] = Merges): Column = {
    validateWellFormed(merges)
    org.apache.spark.sql.graft.BpePriorityEncode.columnFor(word, merges)
  }

  /** BPE token count via the priority-merge kernel: delimiters − 1,
    * the identical arithmetic [[tokenCount]] runs over the chain.
    */
  def tokenCountFast(word: Column,
      merges: Seq[(String, String)] = Merges): Column = {
    val enc = encodeFast(word, merges)
    (length(enc) - length(replace(enc, lit(" "), lit("")))) - lit(1)
  }
}
