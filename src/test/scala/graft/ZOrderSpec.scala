package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrderLayout

/** Morton-key arithmetic plus the actual data-skipping claim: a
  * two-dimensional range predicate over a z-ordered parquet layout must
  * read a fraction of the row groups a single-column clustering reads.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("bit spreading and interleaving match hand-computed Morton codes") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (MaxCell, MaxCell))
      .toDF("a", "b")
      .select(ZOrderLayout.interleave(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // z(3,5) = interleave(0b011, 0b101) = 0b100111 = 39
    assert(got == Seq(0L, 1L, 2L, 39L, (1L << 42) - 1))
  }
  private val MaxCell = (1L << 21) - 1

  test("z-ordered layout prunes row groups on the second dimension") {
    val events = graft.tables.Tables(spark, "/root/testdata/sf0.01").events
      .select(col("event_id"), unix_micros(col("ts")).as("tsu"), col("value"))
    val total = events.count()
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      // one row group per file at this size; 32 files either way
      ZOrderLayout.writeLinear(events, s"$base/linear", "tsu")
      ZOrderLayout.writeZOrdered(events, s"$base/zorder", "tsu", "value")

      // value is uncorrelated with ts, so a narrow value range over the
      // FULL time span is the adversarial predicate for ts-clustering
      def scanRows(dir: String): (Long, Set[Long]) = {
        val df = spark.read.parquet(dir).where(col("value") >= 100 && col("value") <= 120)
        val ids = df.collect().map(_.getAs[Long]("event_id")).toSet
        val plan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        (plan.collectLeaves().map(_.metrics("numOutputRows").value).sum, ids)
      }
      val (linRows, linIds) = scanRows(s"$base/linear")
      val (zRows, zIds) = scanRows(s"$base/zorder")
      assert(zIds == linIds, "layouts must return identical results")
      assert(linRows == total,
        s"ts-clustered layout should read everything for a value predicate (read $linRows of $total)")
      info(s"value-range scan: ts-clustered read $linRows rows, z-ordered read $zRows of $total")
      assert(zRows <= total / 2,
        s"z-order should prune at least half the row groups (read $zRows of $total)")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }
}
