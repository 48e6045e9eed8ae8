package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.lit
import graft.operators.SnapshotDiff

/** Classification-table tests for the snapshot-diff CDC operator: every
  * change class, NULL values on both sides of the comparison (the case
  * a naive `=!=` misclassifies — null-safe `<=>` must treat
  * null→null as unchanged and null→value as update), and the
  * "unchanged rows are dropped" contract.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, Some(10.0), "a"),   // unchanged
    (2L, Some(20.0), "b"),   // value update
    (3L, Some(30.0), "c"),   // deleted
    (4L, None: Option[Double], "d"), // null -> value update
    (5L, Some(50.0), "e")    // value -> null update
  ).toDF("k", "bal", "seg")

  private def newSnap = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(21.0), "b"),
    (4L, Some(40.0), "d"),
    (5L, None: Option[Double], "e"),
    (6L, Some(60.0), "f")    // inserted
  ).toDF("k", "bal", "seg")

  test("classifies insert/update/delete; drops unchanged; null-safe compare") {
    val got = SnapshotDiff
      .diff(oldSnap, newSnap, Seq("k"), Seq("bal", "seg"))
      .orderBy("k").collect().toSeq
    assert(got === Seq(
      Row(2L, "update", 20.0, 21.0, "b", "b"),
      Row(3L, "delete", 30.0, null, "c", null),
      Row(4L, "update", null, 40.0, "d", "d"),
      Row(5L, "update", 50.0, null, "e", "e"),
      Row(6L, "insert", null, 60.0, null, "f")))
  }

  test("identical snapshots diff to zero rows") {
    assert(SnapshotDiff.diff(oldSnap, oldSnap, Seq("k"), Seq("bal", "seg"))
      .count() === 0)
  }

  test("composite keys: change on one key component is insert+delete, not update") {
    val o = Seq((1L, "x", 10.0)).toDF("k1", "k2", "v")
    val n = Seq((1L, "y", 10.0)).toDF("k1", "k2", "v")
    val got = SnapshotDiff.diff(o, n, Seq("k1", "k2"), Seq("v"))
      .orderBy("change_type").collect().toSeq
    assert(got === Seq(
      Row(1L, "x", "delete", 10.0, null),
      Row(1L, "y", "insert", null, 10.0)))
  }

  test("key-only diff (no compare columns) reports membership changes only") {
    val got = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), Seq.empty)
      .orderBy("k").collect().toSeq
    assert(got === Seq(Row(3L, "delete"), Row(6L, "insert")))
  }

  test("diff columns in the reserved __ namespace are rejected loudly") {
    val bad = oldSnap.withColumnRenamed("seg", "__in_old")
    val e = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(bad, bad, Seq("k"), Seq("bal", "__in_old"))
    }
    assert(e.getMessage.contains("__in_old"))
    // an unrelated '__' metadata column NOT in keys/compareCols is
    // projected away by the first select and must stay legal
    val withMeta = oldSnap.withColumn("__source_file", lit("f0"))
    assert(SnapshotDiff.diff(withMeta, withMeta, Seq("k"), Seq("bal"))
      .count() == 0)
  }

  test("validateKeys fails loudly on a duplicate-keyed snapshot") {
    val dup = oldSnap.unionByName(
      Seq((2L, Some(99.0), "z")).toDF("k", "bal", "seg"))
    val e = intercept[Exception] {
      SnapshotDiff.diff(dup, newSnap, Seq("k"), Seq("bal", "seg"),
        validateKeys = true).count()
    }
    assert(e.getMessage.contains("not unique"))
    // and a clean pair still passes with the guard on
    assert(SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), Seq("bal", "seg"),
      validateKeys = true).count() === 5)
  }

  test("null snapshot keys fail loudly; a drifted column type is refused up front (r18 review)") {
    // an UNCHANGED null-keyed row cannot be matched by the equi-join —
    // it would read as a spurious delete+insert pair, so the guard
    // refuses from the executor that meets it
    val withNull = oldSnap.unionByName(
      Seq((Option.empty[Long], Some(1.0), "z")).toDF("k", "bal", "seg"))
    val e = intercept[Exception] {
      SnapshotDiff.diff(withNull, newSnap, Seq("k"), Seq("bal")).count()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e).contains("cannot be matched across snapshots"), msgs(e))
    // schema drift between snapshots must be loud, not coerced through
    // <=> (the operator's whole job is detecting drift)
    val drifted = newSnap.withColumn("bal",
      org.apache.spark.sql.functions.expr("cast(bal as decimal(12,2))"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(oldSnap, drifted, Seq("k"), Seq("bal"))
    }
    assert(e2.getMessage.contains("drifted type"), e2.getMessage)
  }
}
