package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Measures the range-exchange double-execution cost (r18): a global
  * orderBy samples its child to build the range partitioner, so
  * everything between the previous shuffle and the sort runs TWICE.
  * Compares a representative windowed pipeline (rolling zscore) as
  * declared vs with a localCheckpoint barrier before the final sort.
  *
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.SortProbe [sfDir]
  */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(32)
    val spark = graft.GraftSession.local(cpus)
    graft.tables.Tables(spark, sfDir).events.count()

    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sortprobe] $label%-24s min=${ts.min}%6.2f  passes=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    def zscoreBody(spark: SparkSession): DataFrame = {
      val byUser = Window.partitionBy("user_id")
      val w = byUser.orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
      val xc = round(col("value") * 100).cast("long")
      val n = count(lit(1)).over(w)
      val s1 = sum(xc).over(w)
      val s2 = sum(xc * xc).over(w)
      val den = n * s2 - s1 * s1
      val z = round((n * xc - s1).cast("double") /
        (n.cast("double") *
          sqrt(den.cast("double") / (n * (n - lit(1))).cast("double"))), 4) +
        lit(0.0)
      graft.tables.Tables(spark, sfDir).events
        .select(col("event_id"), col("user_id"),
          when(n === 20 && den > 0, z).as("zscore"),
          when(n === 20 && den > 0, (abs(z) > lit(3.0)).cast("double"))
            .as("is_outlier"))
    }

    time("zscore-nosort")(zscoreBody(spark))
    time("zscore-orderby")(zscoreBody(spark).orderBy("event_id"))
    time("zscore-ckpt-orderby") {
      val b = zscoreBody(spark).localCheckpoint()
      b.orderBy("event_id")
    }
    time("zscore-persist-orderby") {
      val b = zscoreBody(spark)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.operators.CacheLifecycle.releaseAfterAction(
        b.orderBy("event_id"), Seq(b))
    }
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    time("persist-nocompress") {
      val b = zscoreBody(spark)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.operators.CacheLifecycle.releaseAfterAction(
        b.orderBy("event_id"), Seq(b))
    }
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")
    time("persist-compress-2") {
      val b = zscoreBody(spark)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.operators.CacheLifecycle.releaseAfterAction(
        b.orderBy("event_id"), Seq(b))
    }
    spark.stop()
  }
}
