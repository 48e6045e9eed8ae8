package graft

import org.apache.spark.sql.functions._
import graft.operators.ValidatedJoin

/** The whole value of [[ValidatedJoin]] is a guarantee: multiplicity
  * violations THROW at action time instead of silently fanning out, and
  * the guard survives the optimizer (a raise_error that column pruning
  * can delete is no safety check). These specs exercise both halves:
  * every contract violation throws with the offending key in the
  * message, valid joins pass through byte-identical to a plain join,
  * null-keyed duplicates are exempt (Spark equi-joins never match NULL
  * keys, so they cannot fan out), and the guard's window rides the
  * exchange the plan already pays — zero extra shuffles.
  */
class ValidatedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def dims = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "dv")
  private def dupDims = Seq((1, "a"), (2, "b"), (2, "bb")).toDF("k", "dv")
  private def facts = Seq((1, 10), (1, 11), (2, 20)).toDF("k", "fv")

  private def violationOf(body: => Unit): String = {
    val e = intercept[Exception](body)
    // raise_error surfaces as SparkRuntimeException wrapped in a task
    // failure; the contract is the message, not the exception class
    val msg = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).filter(_ != null)
      .find(_.contains("validatedJoin"))
    assert(msg.isDefined, s"expected a validatedJoin violation, got $e")
    msg.get
  }

  test("m:1 violation throws, names the side and the offending key") {
    val msg = violationOf(
      ValidatedJoin.join(facts, dupDims, Seq("k"), validate = "m:1").collect())
    assert(msg.contains("right side is not unique"))
    assert(msg.contains("key (2) appears 2 times"))
  }

  test("1:m violation throws on the left side") {
    val msg = violationOf(
      ValidatedJoin.join(facts, dims, Seq("k"), validate = "1:m").collect())
    assert(msg.contains("left side is not unique"))
  }

  test("1:1 throws if EITHER side duplicates; passes when both unique") {
    violationOf(
      ValidatedJoin.join(dims, dupDims, Seq("k"), validate = "1:1").collect())
    val ok = ValidatedJoin.join(dims, dims.select(col("k"), col("dv").as("dv2")),
      Seq("k"), validate = "1:1")
    assert(ok.count() === 3)
  }

  test("valid m:1 returns exactly the plain join's rows") {
    val validated = ValidatedJoin.join(facts, dims, Seq("k"), validate = "m:1")
      .orderBy("k", "fv").collect().toSeq
    val plain = facts.join(dims, Seq("k")).orderBy("k", "fv").collect().toSeq
    assert(validated === plain)
  }

  test("m:m never checks — a genuinely m:m join passes") {
    val df = ValidatedJoin.join(facts, dupDims, Seq("k"), validate = "m:m")
    assert(df.count() === 4) // k=1 ×1 dim ×2 facts, k=2 ×2 dims ×1 fact
  }

  test("duplicate NULL keys on the unique side do NOT throw") {
    val withNulls = Seq[(Option[Int], String)](
      (Some(1), "a"), (None, "x"), (None, "y")).toDF("k", "dv")
    val out = ValidatedJoin.join(facts, withNulls, Seq("k"), validate = "m:1")
    // NULL keys never match in the equi-join: result is just k=1 facts
    assert(out.count() === 2)
  }

  test("guard rides the join's own exchange: SMJ plan has exactly 2 hash shuffles") {
    // force the sort-merge regime (the 100 TB big-big shape): the
    // window's hash-partition-by-key is byte-for-byte the distribution
    // the SMJ requires, so Catalyst must NOT add a third exchange
    val big1 = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("a"))
    val big2 = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("b"))
    val joined = ValidatedJoin.join(big1.hint("merge"), big2, Seq("k"), validate = "1:1")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(plan.contains("SortMergeJoin"), plan)
    assert(exchanges == 2, s"expected 2 hash exchanges (one per side), got $exchanges:\n$plan")
    assert(plan.contains("raise_error"), "guard was optimized away")
  }
}
