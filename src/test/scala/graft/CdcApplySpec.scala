package graft

import org.apache.spark.sql.Row
import graft.operators.CdcApply

/** Fold-semantics tests for the CDC log apply: last-writer-wins per
  * key, delete does not resurrect older images, a late re-insert after
  * a delete resurfaces the LATEST image, deletes of never-seen keys are
  * no-ops, and untouched base rows pass through.
  */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")

  private def log = Seq(
    (2L, "b2", 1L, "U"),   // updated ...
    (2L, null, 2L, "D"),   //  ... then deleted: must stay gone
    (3L, "c2", 1L, "U"),
    (3L, null, 2L, "D"),
    (3L, "c3", 3L, "I"),   // deleted then re-inserted: LATEST image wins
    (4L, "d", 1L, "I"),    // brand-new key
    (5L, null, 1L, "D")    // delete of a key that never existed: no-op
  ).toDF("k", "v", "seq", "op")

  test("last-writer-wins apply with deletes and resurrection") {
    val got = CdcApply.applyLog(base, log, keys = Seq("k"))
      .orderBy("k").collect().toSeq
    assert(got === Seq(Row(1L, "a"), Row(3L, "c3"), Row(4L, "d")))
  }

  test("empty log is the identity") {
    val got = CdcApply.applyLog(base, log.limit(0), keys = Seq("k"))
      .orderBy("k").collect().toSeq
    assert(got === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
  }

  test("validateSeq fails loudly on a duplicated per-key seq") {
    import spark.implicits._
    val base2 = Seq((1L, 1.0)).toDF("k", "v")
    val dup = Seq((1L, 2.0, 5L, "U"), (1L, 3.0, 5L, "U"))
      .toDF("k", "v", "seq", "op")
    val e = intercept[Exception] {
      CdcApply.applyLog(base2, dup, keys = Seq("k"), validateSeq = true)
        .collect()
    }
    assert(e.getMessage.contains("duplicated seq"))
    // the same log folds silently (struct-max tiebreak) without the
    // guard, and a CLEAN log passes the guard unchanged
    assert(CdcApply.applyLog(base2, dup, keys = Seq("k")).count() == 1)
    val clean = Seq((1L, 2.0, 5L, "U"), (1L, 3.0, 6L, "U"))
      .toDF("k", "v", "seq", "op")
    val got = CdcApply.applyLog(base2, clean, keys = Seq("k"),
      validateSeq = true).as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3.0)))
  }

  test("log seq colliding with the base sentinel fails loudly") {
    // Long.MinValue is the virtual-base seq; a log row carrying it would
    // tie with the base in the struct max and silently resolve by
    // op/payload ordering (e.g. a base 'U' beating a log 'D').
    val evil = Seq((1L, null.asInstanceOf[String], Long.MinValue, "D"))
      .toDF("k", "v", "seq", "op")
    val e = intercept[Exception](
      CdcApply.applyLog(base, evil, keys = Seq("k")).collect())
    assert(e.getMessage.contains("Long.MinValue"))
    val nullSeq = Seq((1L, "x", null.asInstanceOf[java.lang.Long], "U"))
      .toDF("k", "v", "seq", "op")
    val e2 = intercept[Exception](
      CdcApply.applyLog(base, nullSeq, keys = Seq("k")).collect())
    assert(e2.getMessage.contains("non-null"))
  }

  test("op outside I/U/D (or NULL) fails loudly instead of mis-folding") {
    // an unknown op would silently act as an upsert; a NULL op would
    // null the final =!= 'D' predicate and silently drop the row
    val unknown = Seq((1L, "x", 1L, "X")).toDF("k", "v", "seq", "op")
    val e = intercept[Exception](
      CdcApply.applyLog(base, unknown, keys = Seq("k")).collect())
    assert(e.getMessage.contains("'I'/'U'/'D'"))
    val nullOp = Seq((1L, "x", 1L, null.asInstanceOf[String]))
      .toDF("k", "v", "seq", "op")
    val e2 = intercept[Exception](
      CdcApply.applyLog(base, nullOp, keys = Seq("k")).collect())
    assert(e2.getMessage.contains("NULL"))
  }

  test("payload columns are required") {
    val keysOnly = Seq(Tuple1(1L)).toDF("k")
    val e = intercept[IllegalArgumentException](
      CdcApply.applyLog(keysOnly, keysOnly, keys = Seq("k")))
    assert(e.getMessage.contains("payload"))
  }
}
