package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Incremental maintenance of a JOIN view (insert-only deltas) — the
  * join-side sibling of the mergeable-partials discipline
  * (`agg_incremental_refresh`): given the classic delta rule
  *
  *   Δ(A ⋈ B)  =  ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * emit the view's NEW rows without recomputing A ⋈ B. Factored here as
  * the disjoint two-join form ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB, which covers
  * each of the three terms exactly once (a pair with both sides new
  * appears only in the first join; old-A×new-B only in the second), so
  * no dedup stage is needed.
  *
  * Scale shape: this is THE reason to maintain a view incrementally —
  * the two base tables are each scanned once and joined only against a
  * delta, never against each other. With `broadcastDeltas` (the normal
  * nightly regime: deltas ≪ base) both joins are broadcast-hash joins
  * and the 100 TB base sides never shuffle at all; when a backfill
  * makes a delta genuinely large, pass false and AQE plans the usual
  * keyed shuffles, still ∝ base + delta. Deletes/updates extend the
  * same algebra with a retraction stream (the CDC path is
  * [[CdcApply]] + [[SnapshotDiff]]); insert-only is the append-log
  * case that dominates event/fact tables.
  */
object IncrementalJoinView {

  /** New view rows induced by insert-only deltas to both join sides.
    *
    * @param aKeys / bKeys positionally-paired equi-join keys
    * @param broadcastDeltas hint both delta frames broadcast-able
    * @return ΔView with columns aOld.columns ++ bOld.columns (names
    *         must be disjoint across the two sides)
    */
  def insertDelta(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      aKeys: Seq[String], bKeys: Seq[String],
      broadcastDeltas: Boolean = true): DataFrame = {
    require(aKeys.nonEmpty && aKeys.length == bKeys.length,
      s"need positionally-paired non-empty join keys, got $aKeys / $bKeys")
    val overlap = aOld.columns.toSet.intersect(bOld.columns.toSet)
    require(overlap.isEmpty,
      s"side column names must be disjoint, both have: ${overlap.mkString(", ")}")
    def hinted(df: DataFrame) = if (broadcastDeltas) broadcast(df) else df
    def cond(a: DataFrame, b: DataFrame) =
      aKeys.zip(bKeys).map { case (x, y) => a(x) === b(y) }.reduce(_ && _)
    val outCols = (aOld.columns ++ bOld.columns).toSeq
    val dA = hinted(aDelta)
    val dB = hinted(bDelta)
    val bAll = bOld.unionByName(bDelta)
    val newA = dA.join(bAll, cond(dA, bAll)).select(outCols.head, outCols.tail: _*)
    val oldANewB = aOld.join(dB, cond(aOld, dB)).select(outCols.head, outCols.tail: _*)
    newA.unionByName(oldANewB)
  }
}
