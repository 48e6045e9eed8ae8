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
  def encode(word: Column): Column = {
    val spaced = concat(lit(" "), regexp_replace(word, "(.)", "$1 "))
    Merges.foldLeft(spaced) { case (c, (l, r)) =>
      val pat = lit(s" $l $r ")
      val rep = lit(s" $l$r ")
      replace(replace(c, pat, rep), pat, rep)
    }
  }

  /** BPE token count of a lowercase [a-z]+ word: delimiters − 1. */
  def tokenCount(word: Column): Column = {
    val enc = encode(word)
    (length(enc) - length(replace(enc, lit(" "), lit("")))) - lit(1)
  }

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
}
