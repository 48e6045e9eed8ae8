package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC log APPLY — fold an ordered change log into a base snapshot:
  * per key, the highest-`seq` record decides the final state — its full
  * after-image if I/U, absence if D (the Debezium / Delta-change-feed
  * apply contract, last-writer-wins). The base snapshot participates as
  * a virtual seq = Long.MinValue upsert of every existing row, so a key
  * never touched by the log survives unchanged and a key deleted then
  * re-inserted resurfaces with the LATEST image, never the base one.
  *
  * Scale shape: base ∪ log → ONE groupBy(key) taking
  * `max(struct(seq, op, payload...))` — struct ordering is decided
  * entirely by the leading seq (required unique per key), and the max
  * is map-side combinable, so a replayed log with deep per-key
  * histories collapses in the partial aggregate before the shuffle. A
  * window-rank formulation gives the same answer but ships every
  * version of every key through the exchange; at 100 TB the partial-agg
  * difference is the whole log volume.
  */
object CdcApply {

  /** @param base snapshot rows: key columns + payload columns
    * @param log  change records: same columns + `seqCol` (unique per
    *             key, monotone in time, non-null and strictly greater
    *             than Long.MinValue — that value is reserved for the
    *             virtual base row; a log row carrying it would tie with
    *             the base in the struct max and silently fall through to
    *             op/payload ordering) + `opCol` (exactly 'I'|'U'|'D',
    *             non-null; the payload of a D row is ignored). Both
    *             contracts are enforced LOUDLY per log row by a
    *             codegen'd check fused into the pre-union projection —
    *             map-side, no extra pass or shuffle — because a silent
    *             fall-through changes last-writer-wins outcomes and a
    *             NULL op would make the final `=!= 'D'` predicate null,
    *             dropping the row as if deleted.
    * @param validateSeq fail LOUDLY (from the executor that meets the
    *             violation, ValidatedJoin-style) if any key carries a
    *             duplicated seq — a duplicated seq makes last-writer-
    *             wins ill-defined (the struct max silently falls
    *             through to the op/payload fields). The check rides
    *             the SAME key shuffle the fold already pays: count vs
    *             count_distinct(seq) inside the one aggregate — no
    *             second pass (Spark plans the distinct via an Expand
    *             over the identical partitioning).
    * @return the post-log snapshot, base's columns
    */
  def applyLog(base: DataFrame, log: DataFrame, keys: Seq[String],
      seqCol: String = "seq", opCol: String = "op",
      validateSeq: Boolean = false): DataFrame = {
    val payload = base.columns.filterNot(keys.contains).toSeq
    require(payload.nonEmpty, "base must carry at least one payload column")
    val virtualBase = base
      .withColumn(seqCol, lit(Long.MinValue)).withColumn(opCol, lit("U"))
    // Loud per-row domain guards on the LOG side only (the virtual base
    // rows are constructed above and trivially conform): seq must not
    // collide with the base sentinel, op must be exactly I/U/D. Fused
    // into the projection the union already needs — codegen'd, zero
    // extra exchange.
    val guardedLog = log.select(virtualBase.columns.map { c =>
      if (c == seqCol)
        when(col(seqCol).isNull || col(seqCol) === Long.MinValue,
          raise_error(concat(
            lit(s"cdc apply: log `$seqCol` must be non-null and > "),
            lit("Long.MinValue (reserved for the virtual base row); got "),
            coalesce(col(seqCol).cast("string"), lit("NULL")))))
          .otherwise(col(seqCol)).as(seqCol)
      else if (c == opCol)
        when(col(opCol).isin("I", "U", "D"), col(opCol))
          .otherwise(raise_error(concat(
            lit(s"cdc apply: `$opCol` must be one of 'I'/'U'/'D'; got "),
            coalesce(col(opCol), lit("NULL"))))).as(opCol)
      else col(c)
    }: _*)
    val unioned = virtualBase.unionByName(guardedLog)
    val folded =
      if (!validateSeq)
        unioned.groupBy(keys.map(col): _*)
          .agg(max(struct((Seq(seqCol, opCol) ++ payload).map(col): _*))
            .as("__last"))
      else
        unioned.groupBy(keys.map(col): _*)
          .agg(max(struct((Seq(seqCol, opCol) ++ payload).map(col): _*))
              .as("__last"),
            count(lit(1)).as("__n"), count_distinct(col(seqCol)).as("__nd"))
          .withColumn("__guard", when(col("__n") =!= col("__nd"),
            raise_error(concat(lit("cdc apply: duplicated seq for key ("),
              concat_ws(", ", keys.map(col): _*),
              lit(") — last-writer-wins is ill-defined"))))
            .otherwise(lit(true)))
          .filter(col("__guard"))
    folded
      .filter(col(s"__last.$opCol") =!= "D")
      .select(keys.map(col) ++
        payload.map(c => col(s"__last.$c").as(c)): _*)
  }
}
