package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has hot keys
  * (SURVEY.md §4.1): salt the large side into `saltBuckets` sub-keys and
  * replicate the small side across all salts, turning one pathological
  * shuffle partition into `saltBuckets` even ones.
  *
  * AQE's runtime skew-join splitting (on by default) handles moderate
  * skew without help; explicit salting is for the planned-ahead case —
  * a known hot key (null surrogate, default tenant, celebrity user)
  * where the replicated-dim cost (|small| × saltBuckets) is cheap
  * against a multi-GB straggler partition.
  */
object Salting {

  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    // r18 review hardening, all three loud-by-construction:
    //  - saltBuckets 0 would pmod to NULL salts (non-ANSI) and return a
    //    silently EMPTY inner join;
    //  - right/full-outer would emit saltBuckets copies of every
    //    unmatched small-side row (it is replicated across all salts —
    //    only large-side-preserving join types keep their semantics);
    //  - a pre-existing __salt column would be overwritten and then
    //    dropped (the SnapshotDiff/CombineFirst '__' namespace rule).
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val okTypes = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(okTypes(joinType.toLowerCase(java.util.Locale.ROOT)),
      s"saltedJoin('$joinType'): only large-side-preserving join types " +
        "keep their semantics under small-side replication (the small " +
        s"side exists once per salt); got one of ${okTypes.mkString(", ")}?")
    for (d <- Seq(large, small) if d.columns.contains("__salt"))
      throw new IllegalArgumentException(
        "input already carries a '__salt' column — it would be " +
          "overwritten and dropped; rename it before salting")
    // deterministic per-row salt: hash of the whole row spreads even a
    // single-key table; any stable expression works
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(saltBuckets.toLong)).cast("int"))
    val expanded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(expanded, keys :+ "__salt", joinType).drop("__salt")
  }
}
