package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one (or more) declared queries
  * — the iterate-until-it's-the-plan-you-want loop ExplainAudit then
  * pins:
  *
  *   runMain graft.tools.ExplainOne <query> [query…] [sfDir]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainOne <query> [query…] [sfDir]")
    val (names, dirs) = args.partition(graft.SparkEntry.queries.contains)
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.01")
    require(names.nonEmpty, s"no known query among: ${args.mkString(", ")}")
    val spark = graft.GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(8))
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
