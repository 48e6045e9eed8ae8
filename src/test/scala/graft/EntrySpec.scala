package graft

/** The driver's t1 smoke contract: SparkEntry.entry returns rows at
  * sf0.001, and every registered query has a well-formed declaration.
  */
class EntrySpec extends SparkSpec {

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry is consistent: every oracle key is a query key") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracle entries: ${os -- qs}")
    assert(qs.nonEmpty)
  }

  test("every declared query executes at sf0.001") {
    // cheap end-to-end sweep: schema resolution + a limit(1) pull per
    // query at the smallest SF (full results are the oracle's job)
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).limit(1).count()
      assert(n >= 0, s"query $name failed")
    }
  }
}
