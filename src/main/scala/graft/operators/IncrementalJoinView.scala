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
  * delta, never against each other. In the normal nightly regime
  * (deltas ≪ base) both joins are broadcast-hash joins and the 100 TB
  * base sides never shuffle at all; when a backfill makes a delta
  * genuinely large, forcing the hint would OOM the HashedRelation
  * build (observed: a 100× lineitem delta under an 8 g driver), so the
  * hint goes through the same deterministic measured-bytes gate as
  * NearDup's broadcast regime — Catalyst's CONSERVATIVE size estimate
  * (file bytes, filters not discounted), inflated for HashedRelation
  * overhead, against a heap-derived budget. Over-estimation only ever
  * demotes a delta to the always-safe keyed shuffle, where AQE can
  * still promote it back from MEASURED runtime sizes. Deletes/updates
  * extend the same algebra with a retraction stream (the CDC path is
  * [[CdcApply]] + [[SnapshotDiff]]); insert-only is the append-log
  * case that dominates event/fact tables.
  */
object IncrementalJoinView {

  /** Conservative HashedRelation inflation over flat bytes (object
    * headers, load factor, the collect copy) — same constant and
    * rationale as NearDup's broadcast gate.
    */
  private val BroadcastInflation = 3.5

  /** New view rows induced by insert-only deltas to both join sides.
    *
    * @param aKeys / bKeys positionally-paired equi-join keys
    * @param broadcastDeltas Some(x) forces the hint on/off for BOTH
    *        deltas; None (default) gates each delta independently on
    *        its estimated bytes vs heap/8
    * @return ΔView with columns aOld.columns ++ bOld.columns (names
    *         must be disjoint across the two sides)
    */
  def insertDelta(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      aKeys: Seq[String], bKeys: Seq[String],
      broadcastDeltas: Option[Boolean] = None): DataFrame = {
    require(aKeys.nonEmpty && aKeys.length == bKeys.length,
      s"need positionally-paired non-empty join keys, got $aKeys / $bKeys")
    val overlap = aOld.columns.toSet.intersect(bOld.columns.toSet)
    require(overlap.isEmpty,
      s"side column names must be disjoint, both have: ${overlap.mkString(", ")}")
    val budget = BigInt(Runtime.getRuntime.maxMemory / 8)
    def hinted(df: DataFrame) = {
      val fits = broadcastDeltas.getOrElse {
        // no job: catalyst's static estimate, conservative by design
        val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
        est * (BroadcastInflation * 10).toInt / 10 <= budget
      }
      if (fits) broadcast(df) else df
    }
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
