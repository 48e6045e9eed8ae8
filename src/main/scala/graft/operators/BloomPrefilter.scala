package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomFilterBridge

/** Bloom-filter semi-join pre-pruning: build a compact bloom filter over
  * the (smaller) filter side's keys with a DISTRIBUTED aggregate, then
  * drop the probe side's definite non-matches BEFORE its rows reach the
  * join shuffle. The exact join still runs after the prune (bloom
  * filters have no false negatives, so the result is identical); what
  * changes is that at 100 TB the dominant cost — shuffling the big
  * side — now moves only rows that might match.
  *
  * This is the deterministic, caller-controlled twin of Spark's
  * runtime row-level filtering (`InjectRuntimeFilter`): that rule
  * applies the same BloomFilterAggregate/BloomFilterMightContain pair,
  * but only when its size thresholds and plan-shape heuristics allow;
  * an engine pipeline that KNOWS its dimension table's cardinality
  * declares the filter explicitly and sizes the bits for a target FPP.
  *
  * Driver footprint is the finished filter only (numBits/8 bytes — the
  * partial aggregation merges sketch buffers executor-side), and the
  * probe-side predicate ships once per task like any literal. Both
  * sides hash with xxhash64 so arbitrary key types reduce to the
  * LongType the sketch ingests.
  */
object BloomPrefilter {

  /** Distributed bloom build over one key column. `numBits` bounds the
    * driver/executor footprint explicitly (bits/8 bytes); size it for
    * the filter side's expected distinct count and target FPP
    * (~1.44 · n · log2(1/fpp) bits).
    */
  def buildBloom(keys: DataFrame, keyCol: String, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    keys.select(BloomFilterBridge.bloomAgg(xxhash64(col(keyCol)),
      expectedItems, numBits)).head().getAs[Array[Byte]](0)
  }

  /** Probe-side predicate: true when `key` MIGHT be in the filter
    * (definite-miss rows are dropped; survivors still need the exact
    * join).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    BloomFilterBridge.mightContain(bloom, xxhash64(key))

  /** Exact semi join with bloom pre-pruning of the probe side: result ≡
    * `probe SEMI JOIN keys` by construction (no false negatives), probe
    * shuffle volume ≈ matching rows + FPP · non-matching. The build is
    * an EAGER distributed job at operator-construction time (same
    * documented lazy-contract departure as the indexed PPJoin build).
    */
  def semiJoinPruned(probe: DataFrame, probeKey: String,
      keys: DataFrame, keyCol: String,
      expectedItems: Long, numBits: Long): DataFrame = {
    val bloom = buildBloom(keys, keyCol, expectedItems, numBits)
    probe.filter(mightContain(bloom, col(probeKey)))
      .join(keys, col(probeKey) === col(keyCol), "left_semi")
  }
}
