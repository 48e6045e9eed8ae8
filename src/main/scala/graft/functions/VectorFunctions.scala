package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `ArrayType(FloatType)` columns
  * (SURVEY.md §2.9), using codegen'd higher-order functions — the
  * whole similarity pipeline stays inside whole-stage codegen with zero
  * object allocation per element.
  *
  * Exactness convention: a float32 times a float32 is exact in double
  * (24+24 mantissa bits < 53), so per-element products are engine-
  * independent; the *sum* is made order-independent by accumulating
  * floor(product * 1e14) in a BIGINT. That keeps every declared
  * similarity query hash-stable against the DuckDB oracle (SURVEY.md
  * §4.2) at ~1e-14 absolute precision — far below any ranking
  * threshold in use.
  */
object VectorFunctions {

  private val Scale = 1e14

  /** Exact scaled dot product as BIGINT (sum of floor(x*y*1e14)), via
    * the codegen'd native expression
    * [[org.apache.spark.sql.graft.VectorDotScaled]].
    */
  def dotScaled(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorDotScaled.columnFor(a, b)

  /** HOF formulation of [[dotScaled]] — numerically identical (asserted
    * in VectorDotSpec); kept as the portable reference implementation.
    */
  def dotScaledHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast("double") * y.cast("double") * Scale).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Dot product in double, via the exact scaled path. */
  def dot(a: Column, b: Column): Column = dotScaled(a, b).cast("double") / Scale

  /** Squared L2 norm (exact path). */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity; null-safe for zero vectors. */
  def cosine(a: Column, b: Column): Column =
    cosineFromNorms(a, b, normSq(a), normSq(b))

  /** Cosine with precomputed squared norms — in a pairwise join,
    * compute `normSq` once per ROW before the join and pass it in, so
    * each pair evaluates one array fold (the dot) instead of three.
    * Arithmetic is identical to [[cosine]] (same ops, same order).
    */
  def cosineFromNorms(a: Column, b: Column, nsqA: Column, nsqB: Column): Column = {
    val denom = sqrt(nsqA * nsqB)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Deterministic seeded unit direction for projection blocking. */
  private def unitDirection(dim: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    val v = Array.fill(dim)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** ε-grid sub-block key for a cosine-threshold pair join: the id of
    * the width-`eps` cell containing the projection of the NORMALIZED
    * vector onto a fixed seeded unit direction.
    *
    * Losslessness: for unit vectors, |u·x̂ − u·ŷ| ≤ ‖x̂ − ŷ‖ =
    * sqrt(2 − 2·cos(x,y)), so with eps ≥ sqrt(2 − 2·minCos) every
    * qualifying pair lands in the SAME or ADJACENT cells. Joining on
    * the cell id with one side exploded to {b−1, b, b+1} is therefore
    * an exact candidate filter — unlike sign-pattern LSH buckets,
    * which drop pairs that straddle a hyperplane. Use it as a
    * secondary key under a coarse block (label, tenant, …) so one hot
    * block can't recreate O(block²) pairs at 100 TB. Zero vectors get
    * a null cell and fall out of the join, matching their exclusion by
    * any cosine threshold.
    */
  def projGridBlock(vec: Column, nsq: Column, dim: Int, eps: Double,
      seed: Long = 7L): Column = {
    val u = array(unitDirection(dim, seed).map(lit): _*)
    val proj = aggregate(zip_with(vec, u, (x, w) => x.cast("double") * w),
      lit(0.0), (acc, x) => acc + x)
    floor(proj / (sqrt(nsq) * eps)).cast("long")
  }

  /** DuckDB SQL twin of [[dotScaled]] built on the fixed dim-64 layout:
    * requires a `generate_series(1, 64) AS t(pos)` lateral in the FROM
    * clause supplying `pos`.
    */
  def dotScaledSql(a: String, b: String): String =
    s"sum(CAST(floor(CAST($a[pos] AS DOUBLE) * CAST($b[pos] AS DOUBLE) * 1e14) AS BIGINT))"

  /** DuckDB SQL twin of [[cosine]] for pre-aggregated scaled sums. */
  def cosineFromScaledSql(dotAb: String, dotAa: String, dotBb: String): String =
    s"(CAST($dotAb AS DOUBLE) / 1e14) / sqrt((CAST($dotAa AS DOUBLE) / 1e14) * (CAST($dotBb AS DOUBLE) / 1e14))"
}
