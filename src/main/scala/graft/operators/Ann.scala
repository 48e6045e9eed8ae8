package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.9): brute-force cosine top-k as the exact baseline, and
  * a random-hyperplane LSH variant as the scale path.
  *
  * Scale design: brute force is a broadcast of the query vector plus one
  * streaming pass with a TakeOrderedAndProject top-k — O(n·d), fine for
  * one-off queries even at 100 TB but not for query batches. The LSH
  * path buckets vectors by sign pattern against `nPlanes` fixed random
  * hyperplanes; a query probes only its own bucket and hamming-1
  * neighbors (multi-probe), reducing scanned rows by ~2^nPlanes/(1+n)
  * at a recall cost measured in AnnSpec. Buckets are precomputable and
  * bucketed-by on disk for repeated workloads.
  */
object Ann {

  /** Deterministic pseudo-random hyperplanes (unit-free; only the sign
    * of the projection matters).
    */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  private def planeCol(p: Array[Double]) = array(p.map(lit): _*)

  /** Bucket id = bit pattern of projection signs. */
  def bucketId(vec: org.apache.spark.sql.Column, nPlanes: Int, dim: Int,
      seed: Long = 42L): org.apache.spark.sql.Column =
    planes(nPlanes, dim, seed).zipWithIndex
      .map { case (p, i) =>
        when(aggregate(zip_with(vec, planeCol(p), (x, w) => x.cast("double") * w),
          lit(0.0), (acc, x) => acc + x) > 0, lit(1 << i)).otherwise(lit(0))
      }
      .reduce(_ + _)

  /** Exact baseline: cosine top-k of `df.vecCol` against the single-row
    * `query` (broadcast).
    */
  def bruteForceTopK(df: DataFrame, query: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(col(vecCol).as("__q")))
    df.crossJoin(q)
      .select(col(idCol), round(cosine(col(vecCol), col("__q")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) variant: k-means the corpus into `nCentroids`
    * cells offline, then probe only the `nProbe` cells whose centroids
    * are nearest the query — the standard billion-scale ANN layout. The
    * cell assignment is a one-off batch job whose output would be
    * partitioned-by-cell on disk at 100 TB; the query side touches
    * ~nProbe/nCentroids of the corpus.
    */
  def ivfTopK(df: DataFrame, query: DataFrame, vecCol: String, idCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = df.withColumn("__features",
      array_to_vector(transform(col(vecCol), x => x.cast("double"))))
    // bucketing needs rough cells, not converged ones — cap iterations
    // (training cost dominates the whole IVF query otherwise)
    val model = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(8)
      .setFeaturesCol("__features").setPredictionCol("__cell")
      .fit(featured)
    val assigned = model.transform(featured)
    // rank cells by centroid distance to the query (driver-side: the
    // centroid table is tiny by construction)
    val qVec = query.select(col(vecCol)).head().getSeq[Float](0).map(_.toDouble).toArray
    val probes = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = c.toArray.zip(qVec).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    val q = broadcast(query.select(col(vecCol).as("__q")))
    assigned.filter(col("__cell").isin(probes.toSeq: _*))
      .crossJoin(q)
      .select(col(idCol), round(cosine(col(vecCol), col("__q")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** LSH variant: restrict the scan to the query's bucket plus all
    * hamming-1 buckets, then exact cosine top-k within candidates.
    */
  def lshTopK(df: DataFrame, query: DataFrame, vecCol: String, idCol: String,
      k: Int, nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val bucketed = df.withColumn("__bucket", bucketId(col(vecCol), nPlanes, dim))
    val q = broadcast(query.select(col(vecCol).as("__q"))
      .withColumn("__qb", bucketId(col("__q"), nPlanes, dim)))
    val probes = array((0 until nPlanes).map(i => lit(1 << i)): _*)
    bucketed.crossJoin(q)
      .filter(col("__bucket") === col("__qb") ||
        array_contains(transform(probes, m => col("__qb").bitwiseXOR(m)), col("__bucket")))
      .select(col(idCol), round(cosine(col(vecCol), col("__q")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
