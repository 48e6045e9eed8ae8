package graft

import org.apache.spark.sql.Row
import graft.operators.CombineFirst

/** The combine_first null matrix: null-CELL-in-present-row and
  * row-absent-in-primary are different cases that the same coalesce
  * must serve — per-cell patching for the former, whole-row fallback
  * (with primary-only columns null) for the latter — plus pass-through
  * of one-sided columns and the loud guards.
  */
class CombineFirstSpec extends SparkSpec {
  import spark.implicits._

  // primary: keys 1,2,3. Key 2 has a NULL cell (patched per-cell);
  // key 3 exists only here. `pOnly` exists only in primary.
  private def primary = Seq(
    (1L, Some(10.0), Some("a")),
    (2L, None, Some("b")),
    (3L, Some(30.0), None)
  ).toDF("k", "v", "pOnly")

  // secondary: keys 1,2,4. Key 4 exists only here. `sOnly` only here.
  private def secondary = Seq(
    (1L, Some(91.0), Some("x")),
    (2L, Some(92.0), Some("y")),
    (4L, None, Some("z"))
  ).toDF("k", "v", "sOnly")

  test("per-cell patch, whole-row fallback, one-sided pass-through") {
    val got = CombineFirst.combineFirst(primary, secondary, Seq("k"))
      .orderBy("k").collect().toSeq
    assert(got === Seq(
      Row(1L, 10.0, "a", "x"),   // both present, primary cell wins
      Row(2L, 92.0, "b", "y"),   // null CELL in present row: patched
      Row(3L, 30.0, null, null), // absent in secondary: sOnly null
      Row(4L, null, null, "z")   // absent in primary: pOnly null, and
                                 // v stays null (secondary had null too)
    ))
  }

  test("column order: keys, primary columns, then secondary-only") {
    val got = CombineFirst.combineFirst(primary, secondary, Seq("k"))
    assert(got.columns.toSeq == Seq("k", "v", "pOnly", "sOnly"))
  }

  test("identity overlays") {
    // secondary with no overlapping keys leaves primary rows untouched
    val disjoint = Seq((9L, Some(99.0), Some("q"))).toDF("k", "v", "sOnly")
    val got = CombineFirst.combineFirst(primary, disjoint, Seq("k"))
      .filter("k < 9").orderBy("k").collect().toSeq
    assert(got === Seq(Row(1L, 10.0, "a", null), Row(2L, null, "b", null),
      Row(3L, 30.0, null, null)))
    // empty secondary is the identity (modulo the sOnly null column)
    assert(CombineFirst.combineFirst(primary, secondary.limit(0), Seq("k"))
      .count() == 3)
  }

  test("updateOverlay: patch cells win, row/column sets stay primary's") {
    val got = CombineFirst.updateOverlay(primary, secondary, Seq("k"))
      .orderBy("k").collect().toSeq
    assert(got === Seq(
      Row(1L, 91.0, "a"),   // patch non-null cell overwrites
      Row(2L, 92.0, "b"),   // patch fills the null cell too
      Row(3L, 30.0, null)   // no patch row: unchanged
      // key 4 (patch-only) does NOT appear; sOnly column does NOT appear
    ))
    assert(CombineFirst.updateOverlay(primary, secondary, Seq("k"))
      .columns.toSeq == Seq("k", "v", "pOnly"))
    // a NULL patch cell leaves the reference value in place
    val nullPatch = Seq((1L, None: Option[Double])).toDF("k", "v")
    val kept = CombineFirst.updateOverlay(primary, nullPatch, Seq("k"))
      .filter("k = 1").collect().head
    assert(kept.getDouble(1) == 10.0)
  }

  test("guards: missing key and reserved namespace fail loudly") {
    val e1 = intercept[IllegalArgumentException](
      CombineFirst.combineFirst(primary, secondary.drop("k"), Seq("k")))
    assert(e1.getMessage.contains("missing from secondary"))
    val e2 = intercept[IllegalArgumentException](
      CombineFirst.combineFirst(
        primary.withColumnRenamed("v", "__v"), secondary, Seq("k")))
    assert(e2.getMessage.contains("reserved"))
  }
}
