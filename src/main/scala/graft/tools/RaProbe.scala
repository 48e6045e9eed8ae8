package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch decomposition of graph_resource_alloc's cost at bench scale:
  * times each candidate formulation of the wedge expansion and the pair
  * aggregate in isolation through the noop sink. Not part of any
  * declared query; exists to adjudicate r18 optimization candidates
  * with numbers instead of guesses.
  *
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.RaProbe [sfDir]
  */
object RaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(32)
    val spark = graft.GraftSession.local(cpus)
    val g = graft.tables.CoPurchaseGraph(spark, sfDir)
    val edges = g.directedEdges
    edges.count() // warm layout + readers

    def time(label: String)(df: => DataFrame): Unit = {
      val plan = df
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        plan.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[raprobe] $label%-28s min=${ts.min}%6.2f  passes=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val bySrc = Window.partitionBy("src")
    // A: old join-based expansion (no aggregate)
    def joinWedges: DataFrame = {
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val capped = edges
        .withColumn("__rn", row_number().over(bySrc.orderBy("dst")))
        .filter(col("__rn") <= 1024).drop("__rn")
      val withDeg = capped.join(deg, "src")
        .select(col("src").as("c"), col("dst").as("a"),
          expr("1000000000 div deg").as("c_ppb"))
      withDeg
        .join(capped.select(col("src").as("c"), col("dst").as("b")), "c")
        .filter(col("a") < col("b"))
        .select("a", "b", "c_ppb")
    }
    // B: generator expansion (no aggregate)
    def genWedges: DataFrame = {
      val capped = edges
        .withColumn("__rn", row_number().over(bySrc.orderBy("dst")))
        .withColumn("deg", count(lit(1)).over(bySrc))
        .filter(col("__rn") <= 1024).drop("__rn")
      val lists = capped.groupBy("src")
        .agg(sort_array(collect_list(col("dst"))).as("__ns"),
          max(col("deg")).as("deg"))
        .select(expr("1000000000 div deg").as("c_ppb"), col("__ns"))
      lists
        .select(col("c_ppb"), posexplode(col("__ns")).as(Seq("__i", "a")),
          col("__ns"))
        .select(col("c_ppb"), col("a"),
          explode(slice(col("__ns"), col("__i") + 2,
            greatest(size(col("__ns")) - col("__i") - 1, lit(0)))).as("b"))
    }
    time("join-wedges-only")(joinWedges)
    time("gen-wedges-only")(genWedges)
    time("join-wedges+agg")(joinWedges.groupBy("a", "b")
      .agg(sum("c_ppb").as("s"), count(lit(1)).as("n")))
    time("gen-wedges+agg")(genWedges.groupBy("a", "b")
      .agg(sum("c_ppb").as("s"), count(lit(1)).as("n")))
    // packed single-long key variant over the join expansion
    time("join-wedges+agg-packed")(joinWedges
      .select((col("a") * 2097152L + col("b")).as("ab"), col("c_ppb"))
      .groupBy("ab").agg(sum("c_ppb").as("s"), count(lit(1)).as("n"))
      .select((col("ab") / 2097152L).cast("long").as("a"),
        pmod(col("ab"), lit(2097152L)).as("b"), col("s"), col("n")))
    // skip the (useless at 1.46:1 collapse) map-side partial agg: shuffle
    // the raw 24-byte wedge rows and aggregate once post-exchange
    time("gen-wedges+repart-agg")(genWedges
      .repartition(col("a"), col("b"))
      .groupBy("a", "b").agg(sum("c_ppb").as("s"), count(lit(1)).as("n")))
    spark.stop()
  }
}
