package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** The MATERIALIZED tokenize-once corpus layout — the per-document
  * term-frequency table `(doc_id, tok, tf, dl)` (tf = the token's
  * count in the doc, dl = the doc's token total), written ONCE,
  * bucketed AND sorted by `tok`.
  *
  * This is the r15 STRESS verdict made a first-class table: every
  * explode-into-shuffle text consumer (vocabulary counts, tf·idf, df
  * joins, BM25 statistics) re-pays tokenization AND shuffles raw TOKEN
  * INSTANCES per query, while the token table stores the collapsed
  * (doc, token) frame and co-locates everything keyed on `tok` — the
  * r15 A/B measured tf·idf 12.2× faster with ZERO exchange records off
  * this layout at 32× corpus scale (STRESS.md r15, `tfidf_table` vs
  * `tfidf_retokenize`). The control finding is equally binding:
  * CHAR-level consumers (quality ratios, langid) must NOT move here —
  * re-tokenizing raw text in codegen was 1.7× faster than decoding the
  * exploded rows, so this table serves exactly the consumers whose
  * plan shape is explode → keyed shuffle, nothing else.
  *
  * Materialization is lazy and idempotent per (warehouse, sfDir) and
  * guarded by [[FixtureSignature]] over `documents.parquet`, so a
  * regenerated fixture invalidates the layout instead of silently
  * serving stale tokens.
  */
object TokenCorpus {

  /** Tokenize `docs` (doc_id, text) into the (doc_id, tok, tf, dl)
    * frame — the one derivation both the build and the append path run.
    */
  private def tokenFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum("tf").over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))

  /** Build an EXPLICIT (non-fixture-memoized) token table over `docs`
    * — the production entry point, where the corpus is an argument and
    * the caller owns the table lifecycle.
    */
  def build(docs: DataFrame, table: String, buckets: Int = 32): Unit =
    Bucketing.writeBucketed(tokenFrame(docs), table, "tok", buckets)

  /** Incremental maintenance — the nightly-ingest shape: tokenize ONLY
    * the new documents and INSERT their rows into the existing bucketed
    * table. Spark enforces the table's bucketing on insert, so
    * co-location survives (each touched bucket gains one file); what
    * multi-file buckets forfeit is the write-time SORT trust — joins
    * stay exchange-free and pay a per-bucket in-memory sort, exactly
    * the [[graft.operators.Bucketing]] contract. Caller contract: delta
    * doc_ids are NEW (append, not upsert — a re-tokenized existing doc
    * would double its rows; CDC on documents is [[graft.operators.MergeUpsert]]'s
    * job, not the layout's). NOT offered for the fixture-memoized
    * [[apply]] table: that one is signature-bound to the fixture
    * parquet, and appending would silently desynchronize it.
    *
    * The insert runs under the table's maintenance lock (r18 review):
    * [[Bucketing.compact]] stages a snapshot then drops-and-rewrites —
    * an append committing between those two steps would be silently
    * DROPPED from the rewritten table; serializing both on the same
    * lock closes that window. Columns are bound BY NAME against the
    * live table's order (insertInto is positional, and tf/dl are both
    * bigint — a transposed order would corrupt statistics silently).
    */
  def append(spark: SparkSession, table: String, deltaDocs: DataFrame): Unit = {
    val lock = Bucketing.maintenanceLockPath(spark, table)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.operators.MaintenanceLock.withLock(fs, lock) {
      tokenFrame(deltaDocs)
        .select(spark.table(table).columns.map(col).toSeq: _*)
        .write.insertInto(table)
    }
  }

  /** Get (materializing on first use) the bucketed token table for the
    * fixture at `sfDir`.
    */
  /** The memoized table name for a fixture dir. The readable sanitized
    * tag alone is AMBIGUOUS (every non-alphanumeric collapses to `_`,
    * so `/data/sf0.1` and `/data/sf0_1` would share one table and
    * alternately clobber each other through the signature check — r18
    * review); an 8-hex digest of the EXACT path disambiguates while
    * keeping the name human-readable.
    */
  private[graft] def tableFor(sfDir: String): String = {
    val tag = sfDir.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9]", "_")
    val digest = java.security.MessageDigest.getInstance("SHA-1")
      .digest(sfDir.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    s"graft_token_corpus_${tag}_$digest"
  }

  def apply(spark: SparkSession, sfDir: String): DataFrame = synchronized {
    val table = tableFor(sfDir)
    val sig = FixtureSignature.of(Seq(s"$sfDir/documents.parquet"))
    if (!FixtureSignature.fresh(spark, table, sig)) {
      val buckets = scala.util.Try(
        spark.conf.get("spark.sql.shuffle.partitions").toInt)
        .getOrElse(32).max(1)
      build(Tables(spark, sfDir).documents, table, buckets)
      FixtureSignature.record(spark, table, sig)
    }
    spark.table(table)
  }
}
