package graft

import graft.operators.IncrementalJoinView
import org.apache.spark.sql.DataFrame

/** The delta rule is an exact algebraic identity — these specs pin it
  * as MULTISET equality (a double-counted ΔA⋈ΔB pair would survive a
  * set compare) against the recomputed view.
  */
class IncrementalJoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def a(rows: (Long, String)*): DataFrame =
    rows.toDF("ak", "av")
  private def b(rows: (Long, String)*): DataFrame =
    rows.toDF("bk", "bv")

  private def multiset(df: DataFrame): Map[(Long, String, Long, String), Long] =
    df.as[(Long, String, Long, String)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

  private def recompute(aAll: DataFrame, bAll: DataFrame): DataFrame =
    aAll.join(bAll, aAll("ak") === bAll("bk"))
      .select("ak", "av", "bk", "bv")

  test("delta view ∪ old view ≡ recomputed view (multiset, incl. ΔA⋈ΔB)") {
    // key 1: old×old (not in delta), old×new, new×old, new×new — every
    // quadrant populated; key 2: delta-only key (ΔA⋈ΔB must appear
    // exactly once); key 3: old-only (must not appear in the delta);
    // duplicate keys on both sides exercise fan-out multiplicities
    val aOld = a((1L, "ao1"), (1L, "ao2"), (3L, "ao"))
    val aNew = a((1L, "an"), (2L, "an"))
    val bOld = b((1L, "bo"), (3L, "bo"))
    val bNew = b((1L, "bn"), (2L, "bn1"), (2L, "bn2"))
    val delta = IncrementalJoinView.insertDelta(aOld, aNew, bOld, bNew,
      Seq("ak"), Seq("bk"))
    val oldView = recompute(aOld, bOld)
    val full = recompute(aOld.unionByName(aNew), bOld.unionByName(bNew))
    // multiset equality over delta ∪ oldView already forces per-key
    // count additivity, so a double-counted ΔA⋈ΔB pair cannot hide
    assert(multiset(delta.unionByName(oldView)) == multiset(full))
  }

  test("empty deltas produce an empty view delta") {
    val aOld = a((1L, "x")); val bOld = b((1L, "y"))
    val delta = IncrementalJoinView.insertDelta(
      aOld, aOld.limit(0), bOld, bOld.limit(0), Seq("ak"), Seq("bk"))
    assert(delta.count() == 0)
  }

  test("colliding side column names are rejected loudly") {
    val aOld = a((1L, "x")).withColumnRenamed("av", "v")
    val bOld = b((1L, "y")).withColumnRenamed("bv", "v")
    val e = intercept[IllegalArgumentException] {
      IncrementalJoinView.insertDelta(aOld, aOld, bOld, bOld,
        Seq("ak"), Seq("bk"))
    }
    assert(e.getMessage.contains("disjoint"))
  }
}
