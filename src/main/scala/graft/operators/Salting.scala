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
    // deterministic per-row salt: hash of the whole row spreads even a
    // single-key table; any stable expression works
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(saltBuckets.toLong)).cast("int"))
    val expanded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(expanded, keys :+ "__salt", joinType).drop("__salt")
  }
}
