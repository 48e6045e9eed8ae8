package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-key-backward) join, the `merge_asof` equivalent.
  *
  * For every left row, attach the payload of the most recent right row
  * with the same `by` keys and `right.ts <= left.ts` (or `<` when
  * `allowExact=false`). Nulls where no prior right row exists (left
  * outer semantics).
  *
  * Implementation: tag both inputs, union them, and take a running
  * `last(payload, ignoreNulls)` over a window partitioned by the `by`
  * keys and ordered by `(ts, tag)` — right rows sort before left rows on
  * ties iff exact matches are allowed. This costs ONE shuffle-sort of
  * |L|+|R| rows on the `by` keys, the same shape as a sort-merge join.
  * The alternative (range join + row_number=1) explodes to |L|×|R_key|
  * intermediate rows under a nested-loop plan, which is unusable at
  * 100 TB; the union trick scales linearly and handles skewed keys with
  * AQE like any other sort.
  */
object AsofJoin {

  /** @param payload right-side columns to carry onto matching left rows
    *                (must not collide with left column names).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      ts: String,
      by: Seq[String],
      payload: Seq[String],
      allowExact: Boolean = true): DataFrame = {
    val (lTag, rTag) = if (allowExact) (1, 0) else (0, 1)
    val l2 = left
      .withColumn("__side", lit("L")).withColumn("__tag", lit(lTag))
    val r2 = right
      .select((by :+ ts).map(col) :+ struct(payload.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit("R")).withColumn("__tag", lit(rTag))
    val w = Window
      .partitionBy(by.map(col): _*)
      .orderBy(col(ts).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns.toSeq
    l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === "L")
      .select(leftCols.map(col) ++ payload.map(p => col(s"__match.$p").as(p)): _*)
  }
}
