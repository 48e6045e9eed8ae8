package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Update keys must be non-null — ENFORCED loudly per row (a
  * null-keyed update matches nothing and would otherwise surface as an
  * all-null ghost row); presence after the outer join is detected by a
  * reserved marker column, not key-null checks, so null-able key TYPES
  * in base never misclassify. Schemas must agree exactly — this is
  * whole-row replacement, not per-column patching (use null-coalescing
  * per column for that). `validateKeys = true` additionally enforces
  * updates unique per key (a duplicate fans the outer join out,
  * replacing the base row N times).
  */
object MergeUpsert {

  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      validateKeys: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(base.columns.toSeq == updates.columns.toSeq,
      s"schemas must match: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    // names alone are not enough: a dtype mismatch would silently widen
    // through when/otherwise coercion (or fail late with an opaque cast
    // error), changing the output schema from base's
    require(base.schema.fields.map(_.dataType).toSeq ==
        updates.schema.fields.map(_.dataType).toSeq,
      s"column types must match: ${base.schema.simpleString} vs ${updates.schema.simpleString}")
    // the non-null-update-key contract below is ENFORCED, not just
    // documented (r18 review): a null-keyed update row matches nothing
    // in the outer join and `fromU` reads false for it, so it would
    // surface as an all-NULL ghost row in the merged table. The loud
    // guard is fused into a PRESENCE MARKER, not the key projection —
    // rewriting a key attribute through a CASE makes the planner forget
    // a bucketed scan satisfies the join distribution (the SnapshotDiff
    // marker discipline; its spec pins the zero-exchange plan) — and
    // the marker doubles as the match detector, stronger than the
    // key-null check it replaces.
    require(!base.columns.contains("__u_present"),
      "'__u_present' collides with the upsert's reserved marker column")
    val marker = keys.foldLeft(lit(1): Column) { (acc, k) =>
      when(col(k).isNull, raise_error(lit(
        s"upsert: update key '$k' must be non-null — a null-keyed " +
          "update matches nothing and would emit an all-null ghost row")))
        .otherwise(acc)
    }
    val guarded0 = updates.withColumn("__u_present", marker)
    // optional 'keyed updates' contract — unique per key (a duplicate
    // fans the outer join out, emitting the base row replaced N times);
    // same count-over-key guard as ValidatedJoin, riding the join's own
    // hash distribution
    val guarded =
      if (validateKeys) ValidatedJoin.guarded(guarded0, keys, "updates")
      else guarded0
    val b = base.alias("__b")
    val u = guarded.alias("__u")
    val cond = keys.map(k => col(s"__b.$k") === col(s"__u.$k")).reduce(_ && _)
    // presence via the marker, not key-null checks: the marker is only
    // non-null when a REAL update row matched (and evaluating it is
    // what fires the null-key guard map-side, before the join)
    val fromU = col("__u.__u_present").isNotNull
    b.join(u, cond, "full_outer")
      .select(base.columns.toSeq.map { c =>
        when(fromU, col(s"__u.$c")).otherwise(col(s"__b.$c")).as(c)
      }: _*)
  }
}
