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
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as raw longs and truncate to
    * microsecond TimestampType — exactly what DuckDB does on the oracle
    * side (verified: 179575175 ns -> 179575 µs, floor division).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, sfDir: String): Tables = new Tables(spark, sfDir)
}
