package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the shuffle-ELIMINATION lever for repeated
  * big-to-big joins (SURVEY.md §2.1 "repartition/bucketing"): writing
  * both fact tables bucketed by the join key into the same bucket
  * count pre-shuffles them ONCE at write time, so every later join on
  * that key reads co-located buckets and plans with ZERO Exchange on
  * either side (asserted in BucketingSpec). At 100 TB this converts
  * the dominant recurring cost of a star-join workload — re-shuffling
  * the fact table per query — into a one-time layout decision, exactly
  * like the `partitionBy("__cell")` ANN index and the z-order layout
  * are one-time layout moves for scans.
  *
  * Bucket-count guidance at scale: pick `buckets` so one bucket of the
  * LARGER table is a few hundred MB (buckets = size / 256 MB, rounded
  * to a power of two); both sides of a co-located join must use the
  * SAME count, and `sortBy` the key so sort-merge joins skip their
  * sort phase too. Skipping the SORT additionally requires (a) one
  * file per bucket — [[writeBucketed]] guarantees that by
  * repartitioning on the bucket key before the write — and (b)
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`
  * ([[graft.GraftSession]] sets it; sort-order propagation went
  * opt-in in Spark 3.1 because multi-file buckets forfeit it).
  * Without the flag the join still plans with zero Exchange, paying
  * only a per-bucket in-memory sort.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and sorted) by
    * `key` into `buckets` buckets.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-column variant (r17 verdict #5): bucket id is the Murmur3
    * hash over ALL `keys` — the same `HashPartitioning` the
    * pre-write `repartition(buckets, keys…)` applies, so the
    * one-file-per-bucket guarantee (and with it the trusted write-time
    * sort) holds for composite keys exactly as for single ones.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty, "need at least one bucket column")
    // unqualified names only: the orphan-location cleanup below assumes
    // the default database's warehouse layout (db-qualified managed
    // tables live under <warehouse>/<db>.db/<name>)
    require(!table.contains('.'), s"unqualified table name required: $table")
    val spark = df.sparkSession
    // The orphan-directory path below is <warehouse>/<name>, which is only
    // the managed location when the CURRENT database is 'default' — in any
    // other database DROP TABLE and the delete would target two different
    // tables (dropping the current-db one, erasing the default-db one's
    // data). Refuse rather than guess.
    require(spark.catalog.currentDatabase == "default",
      s"writeBucketed requires currentDatabase='default' " +
        s"(got '${spark.catalog.currentDatabase}'): the orphan-location " +
        "cleanup assumes the default database's warehouse layout")
    // mode(overwrite) replaces a REGISTERED table, but an orphan
    // managed-table directory (crashed previous writer) still collides
    // with LOCATION_ALREADY_EXISTS — drop both before writing.
    // Locale.ROOT: Spark lowercases identifiers locale-insensitively
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    try loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    catch { case _: java.io.IOException => () }
    // repartition on the bucket key first (same Murmur3 hash as bucket
    // assignment), so each write task owns exactly ONE bucket and each
    // bucket is exactly ONE file: Spark trusts a bucketed scan's sort
    // order only for single-file buckets — multi-file buckets keep the
    // exchange-free join but re-insert a per-bucket Sort, forfeiting
    // half of what sortBy paid for
    df.repartition(buckets, keys.map(df.col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Join two same-bucket-count tables on their bucket key — a plain
    * equi-join; the bucketed scans make it exchange-free.
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** File count per bucket of a bucketed managed table — the
    * compaction trigger signal. Spark encodes the bucket id as the
    * `_NNNNN` suffix of each data file
    * (`part-00000-<uuid>_00003.c000.snappy.parquet` → bucket 3), so a
    * listing answers without reading a footer. A freshly
    * [[writeBucketed]]-written table reads 1 everywhere; every
    * `insertInto` append adds one file to each bucket the delta
    * touches.
    */
  def filesPerBucket(spark: SparkSession, table: String): Map[Int, Int] = {
    // unqualified names only, same contract as writeBucketed (r17
    // ADVICE): TableIdentifier("db.tbl") would treat the dotted name as
    // ONE unqualified part and resolve the wrong (or no) table — parse
    // ambiguity this maintenance surface refuses rather than guesses
    require(!table.contains('.'), s"unqualified table name required: $table")
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketId = "_(\\d{5})\\.c".r
    fs.listStatus(loc).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("part-"))
      .flatMap(n => bucketId.findFirstMatchIn(n).map(_.group(1).toInt))
      .groupBy(identity).map { case (b, xs) => b -> xs.size }
  }

  /** Bucket-preserving compaction (r16 verdict #1b): after months of
    * nightly `insertInto` appends the SMALL-FILE COUNT, not the data,
    * becomes the scan bottleneck (every file pays open + footer +
    * dictionary overhead, and multi-file buckets forfeit the
    * write-time sort trust, re-inserting a per-bucket Sort into every
    * co-located join). Rewrite the table's current contents through
    * [[writeBucketed]] with its OWN key and bucket count — back to the
    * one-file-per-bucket target state, co-location and contents
    * unchanged (spec: reads identical before/after, join plans keep
    * zero Exchange).
    *
    * The contents are STAGED to a plain parquet dir first: writeBucketed
    * drops the table before writing, and a lazy self-read would scan
    * the files the drop just deleted. A [[graft.tables.FixtureSignature]]
    * stamp, if present, is re-recorded after the rewrite (compaction
    * changes layout, not derivation — the memoized table stays fresh).
    * Same single-maintainer contract as the append path itself.
    */
  def compact(spark: SparkSession, table: String): Unit = {
    // unqualified names only (r17 ADVICE): TableIdentifier and the
    // backtick-quoted SHOW TBLPROPERTIES below would both mis-resolve a
    // db-qualified "db.tbl" as one dotted identifier, and writeBucketed
    // (which performs the rewrite) requires the default database anyway
    require(!table.contains('.'), s"unqualified table name required: $table")
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$table is not bucketed — nothing to compact"))
    val keys = spec.bucketColumnNames
    val sig = spark.sql(s"SHOW TBLPROPERTIES `$table`").collect()
      .find(_.getString(0) == "graft.src.sig").map(_.getString(1))
    val stage = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"${table.toLowerCase(java.util.Locale.ROOT)}__compact_stage")
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // single-maintainer contract made checkable (r17 verdict #5): two
    // concurrent compacts would interleave the drop-and-rewrite below —
    // and an unguarded APPEND whose insertInto lands between the stage
    // snapshot and the drop would be silently dropped from the rewrite,
    // so the append path (TokenCorpus.append) takes the SAME lock
    val lock = maintenanceLockPath(spark, table)
    MaintenanceLock.withLock(fs, lock) {
    spark.table(table).write.mode("overwrite").parquet(stage.toString)
    // the stage is deleted ONLY after the rewrite succeeds: writeBucketed
    // drops the table before writing, so on a mid-write failure the
    // staged parquet is the only surviving copy — a finally-delete here
    // would turn a transient write error into permanent data loss (the
    // crash-recovery path is `writeBucketed(spark.read.parquet(stage),
    // table, key, buckets)` by hand, then delete the stage)
    try {
      writeBucketed(spark.read.parquet(stage.toString), table, keys,
        spec.numBuckets)
    } catch {
      case e: Throwable =>
        throw new IllegalStateException(
          s"compact($table) failed mid-rewrite; the table's full contents " +
            s"survive at $stage — rewrite them through writeBucketed and " +
            "delete the stage to recover", e)
    }
    fs.delete(stage, true)
    sig.foreach(graft.tables.FixtureSignature.record(spark, table, _))
    }
  }

  /** The one lock scope every maintainer AND writer of a bucketed
    * managed table shares — compact's drop-and-rewrite vs a concurrent
    * append is exactly as destructive as compact-vs-compact (the
    * append's committed rows silently miss the rewrite), so
    * [[graft.tables.TokenCorpus.append]] serializes on the same file.
    */
  private[graft] def maintenanceLockPath(spark: SparkSession,
      table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"${table.toLowerCase(java.util.Locale.ROOT)}__maintenance.lock")

  /** [[compact]] when any bucket's file count exceeds `maxFilesPerBucket`
    * — the nightly-maintenance guard an append pipeline schedules after
    * its inserts. Returns true iff a rewrite ran.
    */
  def compactIfNeeded(spark: SparkSession, table: String,
      maxFilesPerBucket: Int = 4): Boolean = {
    require(maxFilesPerBucket >= 1, s"threshold must be >= 1")
    val worst = filesPerBucket(spark, table).values.maxOption.getOrElse(0)
    val run = worst > maxFilesPerBucket
    if (run) compact(spark, table)
    run
  }
}
