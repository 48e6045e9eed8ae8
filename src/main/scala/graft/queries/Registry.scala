package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A declared query: the Spark implementation plus (when SQL-expressible)
  * its DuckDB oracle twin. Queries without an oracle get the driver's
  * weaker rows-only check and are additionally covered by ScalaTest.
  */
final case class Declared(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Declared {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): Declared =
    Declared(fn, Some(sql))
}
