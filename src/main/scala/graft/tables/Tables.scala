package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated fixture tables (schemas: FIXTURES.md).
  *
  * Each table is one parquet file under the scale-factor directory. Reads
  * go through `spark.read.parquet`, so Catalyst's predicate pushdown,
  * column pruning, and vectorized parquet reader apply automatically —
  * at 100 TB these tables would be directories of many files (and
  * typically hive-partitioned), which the same call handles unchanged.
  */
final class Tables(spark: SparkSession, sfDir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def supplier: DataFrame   = t("supplier")
  def customer: DataFrame   = t("customer")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, sfDir: String): Tables = new Tables(spark, sfDir)
}
