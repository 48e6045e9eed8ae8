package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.tables.{CoPurchaseGraph, Tables}

/** The shared materialized co-purchase graph: its tables must equal the
  * inline lineitem derivation the five graph queries used before it
  * existed (set-exact), src-keyed aggregates over the bucketed edge
  * table must plan with ZERO exchange (the layout's whole point), and a
  * second `apply()` must reuse the written files, not rebuild.
  */
class CoPurchaseGraphSpec extends SparkSpec {

  private def setEq(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def inlinePo: DataFrame = Tables(spark, sf).lineitem
    .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    .distinct()

  test("materialized tables equal the inline lineitem derivation") {
    val g = CoPurchaseGraph(spark, sf)
    val po = inlinePo
    val refDirected = po.select(col("ok"), col("pk").as("src"))
      .join(po.select(col("ok"), col("pk").as("dst")), "ok")
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("n_common"))
    assert(setEq(g.directedEdges, refDirected.select("src", "dst")),
      "directed edge set drifted from the inline derivation")
    assert(setEq(g.pairCounts,
      refDirected.filter(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"), col("n_common"))),
      "canonical pair counts drifted")
    assert(setEq(g.canonicalEdges,
      refDirected.filter(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))),
      "canonical edge set drifted")
    assert(setEq(g.orderDegrees,
      po.groupBy("pk").agg(count(lit(1)).as("n_orders"))),
      "order-degree table drifted")
  }

  test("src-keyed aggregate over the bucketed edge scan has zero exchange") {
    val g = CoPurchaseGraph(spark, sf)
    // PageRank's out-degree aggregate shape: groupBy the bucket key.
    // The bucketed scan IS the hash partitioning, so no Exchange may
    // appear anywhere in the final plan.
    val agg = g.directedEdges.groupBy("src").agg(count(lit(1)).as("deg"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    assert(!plan.contains("Exchange"),
      s"src-keyed aggregate over the bucketed edge table shuffled:\n$plan")
  }

  test("oriented table: low→high in (degree, id) order, set-equal to canonical") {
    val g = CoPurchaseGraph(spark, sf)
    val o = g.orientedEdges
    // every oriented edge is the canonical pair in SOME direction
    assert(setEq(
      o.select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")),
      g.canonicalEdges))
    // orientation invariant: (deg(src), src) < (deg(dst), dst), with
    // d_deg carrying deg(dst) — rebuild degrees independently and check
    val deg = g.directedEdges.groupBy("src").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "node")
    val bad = o
      .join(deg.select(col("node").as("src"), col("deg").as("sdeg")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("ddeg")), "dst")
      .filter(col("ddeg") =!= col("d_deg") ||
        !(struct(col("sdeg"), col("src")) < struct(col("ddeg"), col("dst"))))
    assert(bad.isEmpty, "orientation or carried degree violated")
  }

  test("trianglesFromOriented equals triangleCounts on the same graph") {
    val g = CoPurchaseGraph(spark, sf)
    assert(setEq(
      graft.queries.GraphOps.trianglesFromOriented(g.orientedEdges),
      graft.queries.GraphOps.triangleCounts(g.canonicalEdges)))
  }

  test("wedge self-join over the oriented table has zero exchange and zero sort") {
    val g = CoPurchaseGraph(spark, sf)
    val ed = g.orientedEdges
    val wedges = ed.select(col("src"), col("dst").as("a"))
      .join(ed.select(col("src"), col("dst").as("b")), "src")
      .filter(col("a") < col("b"))
    // fixture is broadcast-small which would bypass the bucketed path;
    // force the big-big plan two 100 TB edge tables would get
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // one-file-per-bucket sort order stopped propagating by default in
    // Spark 3.1 (listing cost); the opt-in flag restores it — the
    // writeBucketed single-file-per-bucket layout is what makes the
    // flag USABLE (multi-file buckets have no global per-bucket order)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      wedges.write.format("noop").mode("overwrite").save()
      val plan = wedges.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("Bucketed: true"), s"not a bucketed read:\n$plan")
      assert(!plan.contains("Exchange"),
        s"wedge join shuffled an edge side:\n$plan")
      assert(!plan.contains("Sort "),
        s"wedge join re-sorted a sorted bucket:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("second apply() reuses the written tables instead of rebuilding") {
    val g1 = CoPurchaseGraph(spark, sf)
    def mtimes(table: String): Map[String, Long] = {
      val dir = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = mtimes(g1.edgeTable)
    assert(before.nonEmpty)
    val g2 = CoPurchaseGraph(spark, sf)
    assert(g2.edgeTable == g1.edgeTable)
    assert(mtimes(g2.edgeTable) == before,
      "second apply() rewrote the edge table")
  }
}
