package graft

import org.apache.spark.sql.functions._
import graft.queries.GraphOps

/** Round-16 additions: the hub-degree guard on the RA wedge expansion
  * (r15 verdict #1) and its exactness/boundedness contract.
  */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  test("resourceAllocScores: cap >= max degree is exact on the fixture graph") {
    val g = graft.tables.CoPurchaseGraph(spark, sf)
    val e = g.directedEdges
    val maxDeg = e.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max("d")).head().getLong(0)
    assert(maxDeg <= 1024L,
      s"fixture max degree $maxDeg outgrew the declared cap — bump capC")
    val capped = GraphOps.resourceAllocScores(e, capC = 1024)
      .as[(Long, Long, Long, Long)].collect().toSet
    val uncapped = GraphOps.resourceAllocScores(e, capC = Int.MaxValue)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(capped == uncapped && capped.nonEmpty)
  }

  test("resourceAllocScores: planted hub is enumeration-bounded, scores keep the true degree") {
    val h = 20
    val spokes = spark.range(1, h + 1L)
    val star = spokes.select(lit(0L).as("src"), col("id").as("dst"))
      .unionByName(spokes.select(col("id").as("src"), lit(0L).as("dst")))
    val cap = 8
    val got = GraphOps.resourceAllocScores(star, capC = cap)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    // only the hub (deg h) makes wedges; capped to its `cap` SMALLEST
    // neighbors -> exactly C(cap,2) pairs over spokes 1..cap
    val expect = (for (a <- 1 to cap; b <- (a + 1) to cap)
      yield (a.toLong, b.toLong, 1000000000L / h, 1L)).sortBy(r => (r._1, r._2))
    assert(got == expect)
    // uncapped for contrast: the full C(h,2) blow-up from one key
    assert(GraphOps.resourceAllocScores(star, capC = Int.MaxValue).count()
      == h.toLong * (h - 1) / 2)
  }

  test("graph_resource_alloc: the n_common floor is lossless on the fixture top-50") {
    val g = graft.tables.CoPurchaseGraph(spark, sf)
    val scored = GraphOps.resourceAllocScores(g.directedEdges, capC = 1024)
    val ce = g.canonicalEdges
    val unfloored = scored
      .join(ce, scored("a") === ce("u") && scored("b") === ce("v"), "left_anti")
      .orderBy(col("score_ppb").desc, col("a"), col("b")).limit(50)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(unfloored.forall(_._4 >= 2L),
      "a 1-common-neighbor pair reached the fixture top-50; the declared floor is lossy here")
    val floored = GraphOps.graphResourceAlloc(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(floored == unfloored)
  }

  test("text_tfidf_table is layout-blind: identical rows to the raw-text twin") {
    val raw = graft.queries.TrainPrep.textTfidfTopterms(spark, sf)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    val tbl = graft.queries.TrainPrep.textTfidfTable(spark, sf)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    assert(tbl == raw && raw.nonEmpty)
  }
}
