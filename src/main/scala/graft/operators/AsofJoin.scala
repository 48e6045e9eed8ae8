package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** As-of join, the `merge_asof` equivalent: for every left row, attach
  * the payload of the nearest right row with the same `by` keys —
  * backward (`right.ts <= left.ts`, the default), forward
  * (`right.ts >= left.ts`), or nearest (closer of the two, ties to
  * backward), optionally bounded by a `tolerance` on the time gap.
  * Nulls where no qualifying right row exists (left outer semantics).
  *
  * Implementation: tag both inputs, union them, and take a running
  * `last(payload, ignoreNulls)` over a window partitioned by the `by`
  * keys and ordered by `(ts, tag, payload)` — right rows sort before
  * left rows on ties iff exact matches are allowed, and the payload
  * struct itself is the final tiebreak so duplicate-(key, ts) right
  * rows resolve DETERMINISTICALLY (the max payload wins — the
  * total-order convention every declared query follows). The forward
  * direction is the same pass over the reversed ts ordering. This costs
  * ONE shuffle-sort of |L|+|R| rows on the `by` keys (nearest: one
  * shuffle, two sorts — the exchange is reused), the same shape as a
  * sort-merge join. The alternative (range join + row_number=1)
  * explodes to |L|×|R_key| intermediate rows under a nested-loop plan,
  * which is unusable at 100 TB; the union trick scales linearly and
  * handles skewed keys with AQE like any other sort.
  */
object AsofJoin {

  /** Matched right rows carry their own ts as `__rts` inside the payload
    * struct so tolerance/nearest can compare gaps after the window pass.
    */
  private def taggedUnion(left: DataFrame, right: DataFrame, ts: String,
      by: Seq[String], payload: Seq[String], lTag: Int, rTag: Int): DataFrame = {
    val l2 = left
      .withColumn("__side", lit("L")).withColumn("__tag", lit(lTag))
    val r2 = right
      .select((by :+ ts).map(col) :+
        struct(col(ts).as("__rts") +: payload.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit("R")).withColumn("__tag", lit(rTag))
    l2.unionByName(r2, allowMissingColumns = true)
  }

  /** Running nearest-payload window for one direction: ts ascending for
    * backward, descending for forward; `__p` as the deterministic
    * duplicate tiebreak.
    */
  private def matchWindow(ts: String, by: Seq[String], forward: Boolean): WindowSpec =
    Window.partitionBy(by.map(col): _*)
      .orderBy((if (forward) col(ts).desc else col(ts).asc) +:
        Seq(col("__tag").asc, col("__p").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Null out a matched payload whose time gap exceeds the tolerance
    * (an interval or numeric expression matching the ts type, e.g.
    * "INTERVAL 30 MINUTES").
    */
  private def withinTolerance(matched: Column, gap: Column,
      tolerance: Option[String]): Column =
    tolerance match {
      case Some(t) => when(gap <= expr(t), matched)
      case None => matched
    }

  private def directional(left: DataFrame, right: DataFrame, ts: String,
      by: Seq[String], payload: Seq[String], allowExact: Boolean,
      tolerance: Option[String], forward: Boolean): DataFrame = {
    val (lTag, rTag) = if (allowExact) (1, 0) else (0, 1)
    val w = matchWindow(ts, by, forward)
    val gap =
      if (forward) col("__match.__rts") - col(ts) else col(ts) - col("__match.__rts")
    val leftCols = left.columns.toSeq
    taggedUnion(left, right, ts, by, payload, lTag, rTag)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .withColumn("__match", withinTolerance(col("__match"), gap, tolerance))
      .filter(col("__side") === "L")
      .select(leftCols.map(col) ++ payload.map(p => col(s"__match.$p").as(p)): _*)
  }

  /** @param payload right-side columns to carry onto matching left rows
    *                (must not collide with left column names).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      ts: String,
      by: Seq[String],
      payload: Seq[String],
      allowExact: Boolean = true,
      tolerance: Option[String] = None): DataFrame =
    directional(left, right, ts, by, payload, allowExact, tolerance, forward = false)

  /** Forward as-of: nearest right row with `right.ts >= left.ts` (or
    * `>` when `allowExact=false`).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      ts: String,
      by: Seq[String],
      payload: Seq[String],
      allowExact: Boolean = true,
      tolerance: Option[String] = None): DataFrame =
    directional(left, right, ts, by, payload, allowExact, tolerance, forward = true)

  /** Nearest as-of: the closer of the backward and forward candidates,
    * ties to backward (pandas `direction='nearest'` semantics). One
    * shuffle on the `by` keys, two window sorts over it.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      ts: String,
      by: Seq[String],
      payload: Seq[String],
      tolerance: Option[String] = None): DataFrame = {
    val wb = matchWindow(ts, by, forward = false)
    val wf = matchWindow(ts, by, forward = true)
    val leftCols = left.columns.toSeq
    val gapB = col(ts) - col("__b.__rts")
    val gapF = col("__f.__rts") - col(ts)
    taggedUnion(left, right, ts, by, payload, lTag = 1, rTag = 0)
      .withColumn("__b", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__f", last(col("__p"), ignoreNulls = true).over(wf))
      .withColumn("__b", withinTolerance(col("__b"), gapB, tolerance))
      .withColumn("__f", withinTolerance(col("__f"), gapF, tolerance))
      .withColumn("__match",
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(gapF < gapB, col("__f"))
          .otherwise(col("__b")))
      .filter(col("__side") === "L")
      .select(leftCols.map(col) ++ payload.map(p => col(s"__match.$p").as(p)): _*)
  }
}
