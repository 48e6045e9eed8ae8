package graft.tables

import org.apache.spark.sql.SparkSession

/** Freshness signature for memoized materialized tables
  * ([[BucketedFacts]], [[CoPurchaseGraph]]): the catalog-existence
  * check alone silently reuses a stale layout when the fixture parquet
  * underneath is REGENERATED between sessions (same path, new data) —
  * caught only downstream as an oracle mismatch. The signature is a
  * cheap filesystem stat (total bytes + newest mtime over the source
  * paths, no data scan), recorded as a table property at write time and
  * validated before every reuse; a mismatch rebuilds.
  */
object FixtureSignature {

  private val Prop = "graft.src.sig"

  /** Signature of the fixture files at `paths` (each a file or a
    * directory, walked recursively). Missing paths contribute nothing —
    * the signature of "no source" is stable, and the subsequent build
    * fails loudly on the read instead.
    */
  def of(paths: Seq[String]): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.toSeq.flatMap(walk)
      else if (f.isFile) Seq(f) else Nil
    val fs = paths.map(new java.io.File(_)).flatMap(walk)
    s"${fs.map(_.length).sum}:${(0L +: fs.map(_.lastModified)).max}"
  }

  /** True iff `table` exists AND records exactly `sig` as its source
    * signature (a pre-signature table from an older build reads as
    * stale and rebuilds once).
    */
  def fresh(spark: SparkSession, table: String, sig: String): Boolean =
    spark.catalog.tableExists(table) &&
      spark.sql(s"SHOW TBLPROPERTIES `$table`").collect()
        .exists(r => r.getString(0) == Prop && r.getString(1) == sig)

  /** Stamp `sig` onto a just-written table. */
  def record(spark: SparkSession, table: String, sig: String): Unit = {
    require(!sig.exists(c => c == '\'' || c == '\\'), s"unquotable sig: $sig")
    spark.sql(s"ALTER TABLE `$table` SET TBLPROPERTIES ('$Prop' = '$sig')")
  }
}
