package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Embedding-cosine near-duplicate detection across two corpora
  * (SURVEY.md §2.9, cross-corpus dedup family) — the
  * vector analogue of [[NearDup.ngramJaccardJoin]]: pairs
  * (left_id, right_id, cos) with cos >= minCos, left from the reference
  * corpus, right from the new batch.
  *
  * Scale design: candidates come from an equi-join on (blocking key,
  * ε-grid cell) — the grid key is LOSSLESS for eps >= sqrt(2 − 2·minCos)
  * (see [[graft.functions.VectorFunctions.projGridBlock]]), so this is
  * an exact join, not an approximate one, while the sub-block key
  * bounds a hot blocking-key's pair space at 100 TB. The right side is
  * exploded to the {cell−1, cell, cell+1} neighborhood, the standard
  * adjacent-cell trick.
  */
object EmbeddingNearDup {

  /** One shared candidate/verify core for the self- and cross-corpus
    * shapes: the eps derivation, neighbor explode, cosine verify, and
    * rounding live exactly once so the two public joins cannot drift.
    */
  private def gridCandidates(left: DataFrame, right: DataFrame, vecCol: String,
      idCol: String, blockCols: Seq[String], minCos: Double, dim: Int,
      leftIdOut: String, rightIdOut: String): DataFrame = {
    require(minCos > 0.5, s"grid blocking needs minCos > 0.5 (got $minCos); " +
      "below that the lossless cell width exceeds the projection range — " +
      "use a plain block join")
    val eps = math.sqrt(2.0 - 2.0 * minCos) * 1.0001 // strict >= after rounding
    def keyed(df: DataFrame): DataFrame = df
      .withColumn("__nsq", normSq(col(vecCol)))
      .withColumn("__blk", projGridBlock(col(vecCol), col("__nsq"), dim, eps))
    val blocks: Seq[Column] = blockCols.map(col)
    val a = keyed(left).select(
      (blocks :+ col("__blk") :+ col(idCol).as(leftIdOut) :+
        col(vecCol).as("__va") :+ col("__nsq").as("__na")): _*)
    val b = keyed(right).select(
      (blocks :+ col(idCol).as(rightIdOut) :+ col(vecCol).as("__vb") :+
        col("__nsq").as("__nb") :+
        explode(array(col("__blk") - 1, col("__blk"), col("__blk") + 1)).as("__blk")): _*)
    a.join(b, blockCols :+ "__blk")
      .withColumn("cos",
        cosineFromNorms(col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("cos") >= minCos)
      .select(col(leftIdOut), col(rightIdOut), round(col("cos"), 6).as("cos"))
  }

  /** Exact cross-corpus cosine join. `blockCols` are coarse blocking
    * keys that qualifying pairs must share (label, language, tenant,
    * ...); pass Nil to match on the grid cell alone.
    */
  def cosineJoin(left: DataFrame, right: DataFrame, vecCol: String,
      idCol: String, blockCols: Seq[String], minCos: Double,
      dim: Int = 64): DataFrame =
    gridCandidates(left, right, vecCol, idCol, blockCols, minCos, dim,
      "left_id", "right_id")

  /** Exact self-join near-dup pairs (a < b) within one corpus — the
    * operator behind the `dedup_embedding_neardup` declared query.
    */
  def cosinePairs(corpus: DataFrame, vecCol: String, idCol: String,
      blockCols: Seq[String], minCos: Double, dim: Int = 64): DataFrame =
    gridCandidates(corpus, corpus, vecCol, idCol, blockCols, minCos, dim,
      "a", "b")
      .filter(col("a") < col("b"))
}
