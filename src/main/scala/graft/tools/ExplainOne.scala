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
    // only the TRAILING argument may be the data dir, and it must exist
    // on disk — a misspelled query name must be rejected, not silently
    // reclassified as the sfDir (r17 review finding)
    val (names, sfDir) =
      if (graft.SparkEntry.queries.contains(args.last))
        (args.toSeq, "/root/testdata/sf0.01")
      else {
        require(new java.io.File(args.last).isDirectory,
          s"'${args.last}' is neither a declared query nor a directory")
        (args.init.toSeq, args.last)
      }
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    require(names.nonEmpty, s"no query named among: ${args.mkString(", ")}")
    val spark = graft.GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(8))
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
