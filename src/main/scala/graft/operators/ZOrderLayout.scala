package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet layout — multi-dimensional
  * data skipping (SURVEY.md §2.1 layout / §4 scale notes).
  *
  * A sort on one column gives parquet row-group min/max stats that
  * prune scans on THAT column only; a 100 TB table queried by range on
  * two independent columns (ts AND value, user AND day, lat AND lon)
  * reads everything for the second predicate. Interleaving the bits of
  * both normalized columns and range-partitioning + sorting by the
  * interleaved key clusters rows so every row group spans a small
  * rectangle of (x, y) space — min/max stats then prune on BOTH
  * dimensions (the layout Delta/Iceberg expose as `ZORDER BY` /
  * `sort_order(z-order(...))`).
  *
  * Everything here is plain codegen'd bit arithmetic — the classic
  * bit-spreading sequence (Morton 1966; the shift/mask cascade is the
  * textbook "interleave bits by binary magic numbers" form) — plus one
  * small two-row aggregate to learn each dimension's min/max for
  * normalization. No UDF, no collect of data rows.
  */
object ZOrderLayout {

  /** Bits kept per dimension (2 dims × 21 = 42 < 63). */
  private val Bits = 21
  private val MaxCell = (1L << Bits) - 1

  /** Spread the low 21 bits of `c` so one zero bit separates each
    * (positions 0,2,4,..): 0b...abc -> 0b...a0b0c.
    */
  private[graft] def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(MaxCell))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
    x
  }

  /** Morton key of two 21-bit cell coordinates. */
  private[graft] def interleave(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Normalize a numeric column to a 21-bit cell index given its
    * (min, max); nulls land in cell 0 (stats still bound them).
    */
  private def cell(c: Column, lo: Double, hi: Double): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    val scaled = floor((c.cast("double") - lit(lo)) / lit(span) * lit(MaxCell.toDouble))
    coalesce(greatest(lit(0L), least(lit(MaxCell), scaled.cast("long"))), lit(0L))
  }

  /** The Morton key for two numeric columns of `df` (bounds learned
    * from one two-row aggregate over the input).
    */
  def zKey(df: DataFrame, x: String, y: String): Column = {
    // try_cast for the BOUNDS pass: under ANSI a plain cast of a
    // non-numeric column throws a bare CAST_INVALID_INPUT from inside
    // the stats aggregate; with ansi off it silently yields all-null
    // bounds and a constant key on that axis (r18 review). try_cast
    // makes both modes land on the castable() guard below, which names
    // the column and the consequence.
    def d(name: String) = col(name).try_cast("double")
    val r = df.agg(
      min(d(x)), max(d(x)), min(d(y)), max(d(y)),
      count(col(x)), count(d(x)),
      count(col(y)), count(d(y))).head()
    // a NON-NUMERIC column casts to all-null while its raw values are
    // non-null — the z-key would silently collapse to a constant on
    // that axis and the caller would believe both dimensions prune.
    // Refuse loudly; a genuinely empty or all-null dimension (below)
    // is a different, legitimate case.
    def castable(name: String, rawIdx: Int, castIdx: Int): Unit =
      require(!(r.getLong(rawIdx) > 0 && r.getLong(castIdx) == 0),
        s"z-order column '$name' has ${r.getLong(rawIdx)} non-null values " +
          "but NONE cast to double — a non-numeric column cannot " +
          "cluster; the layout would silently degrade to one axis")
    castable(x, 4, 5); castable(y, 6, 7)
    // empty input / all-null dimension: min/max are null — degrade to
    // cell 0 on that axis (an empty or single-cell layout still writes)
    def bound(i: Int, dflt: Double): Double =
      if (r.isNullAt(i)) dflt else r.getDouble(i)
    interleave(
      cell(col(x), bound(0, 0.0), bound(1, 0.0)),
      cell(col(y), bound(2, 0.0), bound(3, 0.0)))
  }

  /** Write `df` as parquet clustered on the Morton key of (x, y):
    * range-partition into `files` output files, sort within each, drop
    * the key. Row groups then carry tight min/max rectangles on both
    * dimensions, so range predicates on either (or both) prune.
    */
  def writeZOrdered(df: DataFrame, path: String, x: String, y: String,
      files: Int = 32): Unit =
    df.withColumn("__z", zKey(df, x, y))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Comparison layout: same file count, clustered on one column only. */
  def writeLinear(df: DataFrame, path: String, orderCol: String,
      files: Int = 32): Unit =
    df.repartitionByRange(files, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite").parquet(path)
}
