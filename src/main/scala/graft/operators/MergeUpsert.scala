package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD-type-1 upsert merge (the `MERGE INTO` / Dask
  * `concat → drop_duplicates(keep='last')` maintenance pattern —
  * SURVEY.md §2.9 addendum): rows of `updates` replace same-key rows of
  * `base` wholesale; keys present only in `updates` are inserts; all
  * other base rows pass through unchanged.
  *
  * Implementation: ONE full-outer shuffle join on the key columns with
  * a whole-row winner-takes-update projection. A full outer join cannot
  * broadcast (Spark plans it as a sort-merge join regardless of side
  * sizes), so this costs one shuffle of |base|+|updates| on the keys —
  * the same shape Delta/Iceberg `MERGE` executes for copy-on-write
  * tables. At 100 TB the standard refinements compose with this
  * operator unchanged: pre-filter `base` to the key-range/partitions
  * `updates` touches (partition pruning turns the shuffle into
  * |touched partitions|+|updates|), or bucket both tables on the keys
  * so the join is shuffle-free.
  *
  * Keys must be non-null on both sides: the updates-side key's
  * non-nullness is what marks "update row exists" after the outer join
  * (a null-keyed update row would be indistinguishable from "no
  * match"). Schemas must agree exactly — this is whole-row replacement,
  * not per-column patching (use null-coalescing per column for that).
  */
object MergeUpsert {

  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(base.columns.toSeq == updates.columns.toSeq,
      s"schemas must match: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    // names alone are not enough: a dtype mismatch would silently widen
    // through when/otherwise coercion (or fail late with an opaque cast
    // error), changing the output schema from base's
    require(base.schema.fields.map(_.dataType).toSeq ==
        updates.schema.fields.map(_.dataType).toSeq,
      s"column types must match: ${base.schema.simpleString} vs ${updates.schema.simpleString}")
    val b = base.alias("__b")
    val u = updates.alias("__u")
    val cond = keys.map(k => col(s"__b.$k") === col(s"__u.$k")).reduce(_ && _)
    val fromU = keys.map(k => col(s"__u.$k").isNotNull).reduce(_ && _)
    b.join(u, cond, "full_outer")
      .select(base.columns.toSeq.map { c =>
        when(fromU, col(s"__u.$c")).otherwise(col(s"__b.$c")).as(c)
      }: _*)
  }
}
