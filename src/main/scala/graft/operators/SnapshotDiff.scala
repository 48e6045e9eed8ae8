package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-diff change data capture: given two keyed snapshots of the
  * same table, emit the row-level changes (`insert` / `delete` /
  * `update`) that turn the old one into the new one — the batch
  * equivalent of a CDC feed, and the first step of every
  * "backfill-from-snapshots" pipeline when a source system publishes
  * full dumps instead of a changelog.
  *
  * Shape at 100 TB: ONE full-outer equi-join on the key — both sides
  * shuffle-hash on the key exactly once (bucketed snapshots make even
  * that exchange-free), and the dominant "unchanged" mass is dropped by
  * a filter immediately above the join, before anything else
  * materializes. Presence is detected with per-side marker literals,
  * not key-null checks, so NULL-able non-key columns and half-null keys
  * never misclassify; value comparison is per-column null-safe
  * equality (`<=>`), not a hash, so the verdict is exact — no
  * collision caveat to document and nothing extra to carry through the
  * shuffle beyond the columns the caller asked to compare.
  */
object SnapshotDiff {

  /** Changes from `oldSnap` to `newSnap` keyed by `keys`, comparing
    * `compareCols`. Output: keys*, change_type, then `old_<c>` /
    * `new_<c>` per compared column (null on the absent side of
    * inserts/deletes). Unchanged rows are NOT emitted.
    *
    * `validateKeys = true` additionally enforces the "keyed snapshot"
    * contract — each side unique on `keys` — via the same
    * count-over-key window guard as [[ValidatedJoin]] ("1:1"
    * semantics): the window's hash-partition-by-key is the exact
    * distribution the full-outer join needs anyway, so the check rides
    * the join's own shuffle and a duplicate-keyed snapshot fails
    * loudly instead of silently fanning out the diff.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      compareCols: Seq[String], validateKeys: Boolean = false): DataFrame = {
    // the internal presence/new-value columns live in the reserved
    // "__" namespace; fail loudly rather than silently shadowing a
    // user column that happens to collide. Only the columns that
    // actually enter the plan (keys + compareCols) can shadow —
    // unrelated '__' metadata columns are projected away by the first
    // select and stay legal
    for (c <- keys ++ compareCols if c.startsWith("__"))
      throw new IllegalArgumentException(
        s"diff column '$c' collides with SnapshotDiff's reserved " +
          "'__' helper namespace; rename it before diffing")
    val (oldG, newG) =
      if (validateKeys)
        (ValidatedJoin.guarded(oldSnap, keys, "old snapshot"),
          ValidatedJoin.guarded(newSnap, keys, "new snapshot"))
      else (oldSnap, newSnap)
    val o = oldG.select(keys.map(col) ++ compareCols.map(col) :+
      lit(1).as("__in_old"): _*)
    val n = newG.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"__new_$c")) :+
      lit(1).as("__in_new"): _*)
    val joined = o.join(n, keys, "full_outer")
    val changed: Column = compareCols
      .map(c => !(col(c) <=> col(s"__new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val changeType = when(col("__in_old").isNull, "insert")
      .when(col("__in_new").isNull, "delete")
      .when(changed, "update")
    joined
      .withColumn("change_type", changeType)
      // drop the unchanged mass FIRST: at scale it is nearly all rows
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) ++ Seq(col("change_type")) ++
        compareCols.flatMap(c => Seq(
          col(c).as(s"old_$c"), col(s"__new_$c").as(s"new_$c"))): _*)
  }
}
