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
    // dtype agreement on keys + compared columns (r18 review): this
    // operator's whole job is detecting drift between snapshots, so a
    // SCHEMA drift must be loud — `<=>` through an implicit cast could
    // mask real changes (or throw an opaque ANSI cast error mid-job),
    // exactly the silent-widening MergeUpsert already refuses
    for (c <- keys ++ compareCols) {
      val ot = oldSnap.schema(c).dataType
      val nt = newSnap.schema(c).dataType
      require(ot == nt,
        s"snapshot column '$c' drifted type: old=$ot new=$nt — diff the " +
          "schemas deliberately (cast one side) instead of comparing " +
          "through an implicit coercion")
    }
    val (oldG, newG) =
      if (validateKeys)
        (ValidatedJoin.guarded(oldSnap, keys, "old snapshot"),
          ValidatedJoin.guarded(newSnap, keys, "new snapshot"))
      else (oldSnap, newSnap)
    // null keys are ill-defined for a keyed diff: the equi-join cannot
    // match them, so an UNCHANGED null-keyed row would surface as a
    // spurious delete+insert pair (and the ValidatedJoin guard
    // deliberately exempts null keys, so validateKeys cannot catch it).
    // The loud guard is fused into the PRESENCE MARKER, not the key
    // projection (r18 review): rewriting the key attribute through a
    // CASE would make the planner forget a bucketed scan satisfies the
    // join's distribution — re-inserting the exchanges the zero-shuffle
    // layout exists to kill — while the marker is consumed downstream,
    // never pruned, and leaves the key attributes untouched.
    def presenceMarker(side: String): Column =
      keys.foldLeft(lit(1): Column) { (acc, k) =>
        when(col(k).isNull, raise_error(lit(
          s"snapshot diff: $side key '$k' is NULL — null keys cannot be " +
            "matched across snapshots (an unchanged row would read as " +
            "delete+insert); filter or surrogate them first")))
          .otherwise(acc)
      }
    val o = oldG.select(keys.map(col) ++ compareCols.map(col) :+
      presenceMarker("old").as("__in_old"): _*)
    val n = newG.select(keys.map(col) ++
      compareCols.map(c => col(c).as(s"__new_$c")) :+
      presenceMarker("new").as("__in_new"): _*)
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
