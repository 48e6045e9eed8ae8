package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** pandas `df1.combine_first(df2)`, keyed: overlay `secondary` UNDER
  * `primary` — the result holds every key from either side, and each
  * shared cell takes primary's value unless it is null, then
  * secondary's. The standard patch/backfill alignment op: "apply this
  * partial update feed on top of the reference table, keeping the
  * reference where the feed is silent".
  *
  * Cell semantics (the pandas contract, worth being precise about
  * because two different absences collapse to the same coalesce):
  *  - key only in primary → primary's row, secondary-only columns null;
  *  - key only in secondary → secondary's row, primary-only columns
  *    null (including every shared cell: all-null primary side);
  *  - key in both → per-cell `coalesce(primary.c, secondary.c)` for
  *    shared columns — a PRESENT primary row with a null cell is
  *    patched per-cell, not per-row;
  *  - column sets need not match: primary-only and secondary-only
  *    columns pass through (primary's order first, pandas-style).
  *
  * Shape at 100 TB: ONE full-outer equi-join on the key (the
  * [[SnapshotDiff]] core with an overlay projection instead of a
  * classification) — both sides shuffle once; bucketed inputs make even
  * that exchange-free. The projection is pure coalesce arithmetic:
  * nothing widens, nothing re-shuffles.
  */
object CombineFirst {

  def combineFirst(primary: DataFrame, secondary: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    for (k <- keys) {
      require(primary.columns.contains(k), s"key '$k' missing from primary")
      require(secondary.columns.contains(k), s"key '$k' missing from secondary")
    }
    // the renamed secondary columns live in the reserved "__" namespace
    // (same contract as SnapshotDiff): fail loudly over silent shadowing
    for (c <- primary.columns ++ secondary.columns if c.startsWith("__"))
      throw new IllegalArgumentException(
        s"column '$c' collides with CombineFirst's reserved '__' namespace")
    val pCols = primary.columns.filterNot(keys.contains).toSeq
    val sCols = secondary.columns.filterNot(keys.contains).toSeq
    val shared = pCols.toSet intersect sCols.toSet
    val s2 = secondary.select(keys.map(col) ++
      sCols.map(c => col(c).as(s"__s_$c")): _*)
    // join(usingColumns, full_outer) coalesces the key columns itself
    primary.join(s2, keys, "full_outer")
      .select(keys.map(col) ++
        pCols.map(c =>
          if (shared(c)) coalesce(col(c), col(s"__s_$c")).as(c) else col(c)) ++
        sCols.filterNot(shared).map(c => col(s"__s_$c").as(c)): _*)
  }

  /** pandas `df.update(other)`, keyed — the MIRROR overlay: secondary's
    * non-null cells OVERWRITE primary's on shared columns, but the row
    * set and column set are primary's alone (no new rows from
    * secondary-only keys, no new columns — `update` patches in place
    * where `combine_first` merges). One LEFT join on the key; shared
    * cells = `coalesce(secondary.c, primary.c)`.
    */
  def updateOverlay(primary: DataFrame, secondary: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    for (k <- keys) {
      require(primary.columns.contains(k), s"key '$k' missing from primary")
      require(secondary.columns.contains(k), s"key '$k' missing from secondary")
    }
    for (c <- primary.columns ++ secondary.columns if c.startsWith("__"))
      throw new IllegalArgumentException(
        s"column '$c' collides with CombineFirst's reserved '__' namespace")
    val pCols = primary.columns.filterNot(keys.contains).toSeq
    val shared = pCols.toSet intersect
      secondary.columns.filterNot(keys.contains).toSet
    val s2 = secondary.select(keys.map(col) ++
      shared.toSeq.map(c => col(c).as(s"__s_$c")): _*)
    primary.join(s2, keys, "left")
      .select(keys.map(col) ++ pCols.map(c =>
        if (shared(c)) coalesce(col(s"__s_$c"), col(c)).as(c) else col(c)): _*)
  }
}
