package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.9): brute-force cosine top-k as the exact baseline, and
  * two index-backed scale paths — IVF (k-means cells) and
  * random-hyperplane LSH buckets.
  *
  * Scale design: brute force is a broadcast of the query vector plus one
  * streaming pass with a TakeOrderedAndProject top-k — O(n·d), fine for
  * one-off queries even at 100 TB but not for query batches. Both index
  * paths split OFFLINE build from ONLINE probe: the build scans the
  * corpus once to attach a coarse key (k-means cell / hyperplane-sign
  * bucket) and is memoized per (session, corpus plan, params); a probe
  * is an equi-join of the tiny per-query key list against the keyed
  * corpus — never a per-query corpus pass. At 100 TB the keyed corpus is
  * written `partitionBy` on the key ([[writeIndex]]/[[readIndex]]) so a
  * probe's key filter becomes partition pruning on the scan.
  *
  * Index lifecycle: built indexes pin a persisted frame. The memo
  * registries are LRU-bounded (evicted entries unpersist), each index
  * has `release()`, and [[clearIndexes]] drops everything — a long-lived
  * session cannot accumulate dead blocks.
  */
object Ann {

  /** Bucket id = bit pattern of hyperplane-projection signs, via the
    * codegen'd [[org.apache.spark.sql.graft.HyperplaneBucket]] — the
    * index build evaluates this once per corpus row, so it must not be
    * an interpreted HOF chain.
    */
  def bucketId(vec: Column, nPlanes: Int, dim: Int,
      seed: Long = 42L): Column =
    org.apache.spark.sql.graft.HyperplaneBucket.columnFor(vec, nPlanes, dim, seed)

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

  /** Exact batched variant: per-query cosine top-k for every row of
    * `query` in ONE pass over the corpus — the broadcast carries all
    * query vectors and the per-query heads come from one partial-ranked
    * window, not one job per query.
    */
  def bruteForceTopKBatch(df: DataFrame, query: DataFrame, vecCol: String,
      idCol: String, queryIdCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(col(queryIdCol).as("query_id"), col(vecCol).as("__q")))
    perQueryTopK(df.crossJoin(q), vecCol, idCol, k)
  }

  /** Shared per-query ranked head for every batch variant. The rounding
    * (`round(cos, 6)`) and tie-break (cos desc, id asc) are load-bearing
    * for oracle hash-stability, so they live in exactly one place. The
    * input must carry `query_id` and `__q` alongside the corpus columns.
    */
  private def perQueryTopK(joined: DataFrame, vecCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col(idCol))
    joined
      .select(col("query_id"), col(idCol),
        round(cosine(col(vecCol), col("__q")), 6).as("cos"))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select("query_id", idCol, "cos")
  }

  // ---------------------------------------------------------------- IVF

  /** A built IVF index: the corpus with its k-means cell assignment
    * (persisted for repeated probes), plus the tiny centroid table
    * pulled to the driver once at build time (nCentroids rows by
    * construction — NOT a corpus action). At 100 TB `assigned` is
    * written `partitionBy("__cell")` to storage instead of persisted
    * ([[writeIndex]]), so a probe's cell filter becomes partition
    * pruning on the scan.
    */
  final case class IvfIndex(assigned: DataFrame, centroids: Array[Array[Double]]) {
    /** Drop the pinned assignment blocks (idempotent; no-op for an
      * index read back from disk, which pins nothing).
      */
    def release(): Unit = assigned.unpersist(blocking = false)
  }

  /** Index memo registries: a query batch or bench loop must not
    * retrain per query — the build is the offline half. Keys hold the
    * CANONICALIZED ANALYZED PLAN of the corpus (structural equality —
    * not a 32-bit hash that could silently serve a different corpus on
    * collision) plus the session identity and build params. LRU-bounded:
    * evicting an entry unpersists its frame.
    */
  private val MaxIndexes = 8

  private def lruMap[V](onEvict: V => Unit) =
    new java.util.LinkedHashMap[AnyRef, V](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[AnyRef, V]): Boolean =
        if (size() > MaxIndexes) { onEvict(e.getValue); true } else false
    }

  private val ivfIndexes = lruMap[IvfIndex](_.release())
  private val lshIndexes = lruMap[LshIndex](_.release())

  private def corpusKey(df: DataFrame, params: AnyRef): AnyRef =
    // the SESSION OBJECT itself (identity equality, reference retained):
    // a 32-bit identityHashCode alone could be REUSED by a new session
    // after the old one is GC'd and silently serve its cached index
    // (r18 review) — holding the reference pins the identity; the LRU
    // is bounded at MaxIndexes and clearIndexes() releases everything
    (df.sparkSession, df.queryExecution.analyzed.canonicalized, params)

  /** Release every memoized index (both families) — session teardown /
    * explicit cache hygiene.
    */
  def clearIndexes(): Unit = {
    ivfIndexes.synchronized {
      ivfIndexes.values.forEach(i => i.release()); ivfIndexes.clear()
    }
    lshIndexes.synchronized {
      lshIndexes.values.forEach(i => i.release()); lshIndexes.clear()
    }
    pqIndexes.synchronized {
      pqIndexes.values.forEach(i => i.release()); pqIndexes.clear()
    }
    ivfPqIndexes.synchronized {
      ivfPqIndexes.values.forEach(i => i.release()); ivfPqIndexes.clear()
    }
  }

  /** Lloyd's k-means over a driver-side sample. The sample is bounded
    * (fitSample × dim doubles, a few MB), so training is microseconds of
    * driver CPU — no ML-pipeline jobs in the query path. Centroid
    * QUALITY only shifts which cells a probe visits; recall comes from
    * assigning the FULL corpus distributedly and probing nProbe cells.
    */
  private def localKMeans(points: Array[Array[Double]], k: Int,
      seed: Long, iters: Int = 8): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val dim = points.head.length
    var centroids =
      rnd.shuffle(points.indices.toVector).take(k).map(i => points(i).clone).toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < centroids.length) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = p(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(centroids.length) { c =>
        if (counts(c) == 0) centroids(c) else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  /** Cell ids of the `n` centroids nearest `vec` — the codegen'd
    * [[org.apache.spark.sql.graft.NearestCells]] expression (the
    * centroid matrix rides along as a constant; NOT a literal-array HOF
    * chain, which cost ~2.5 s of Catalyst analysis per plan, and no
    * longer a Scala UDF paying converters per corpus row).
    */
  private def nearestCells(centroids: Array[Array[Double]], n: Int)(vec: Column): Column =
    org.apache.spark.sql.graft.NearestCells.columnFor(vec, centroids, n)

  /** Offline half: train rough k-means cells on a bounded,
    * DETERMINISTIC sample (hash-ordered top-N — one scan with
    * per-partition heaps, not a `limit` whose rows depend on partition
    * order) and assign every corpus row to its nearest cell in one
    * distributed map pass (no ML pipeline). An empty corpus yields an
    * empty index (no training, nothing pinned).
    */
  /** Driver-side vector decode accepting BOTH array<float> and
    * array<double> rows — the kernel expressions advertise both
    * ([[org.apache.spark.sql.graft.NearestCells]]'s TypeCollection),
    * and a hard-coded getSeq[Float] would ClassCastException on a
    * double-vector corpus at exactly the bounded sample/query collects
    * (r18 review).
    */
  private def vecOf(row: org.apache.spark.sql.Row, i: Int): Array[Double] =
    row.getSeq[Any](i).iterator.map {
      case f: Float => f.toDouble
      case d: Double => d
      case n: java.lang.Number => n.doubleValue()
    }.toArray

  def ivfBuild(df: DataFrame, vecCol: String, nCentroids: Int = 16,
      seed: Long = 42L, fitSample: Int = 4096): IvfIndex = {
    val sample = df.select(col(vecCol))
      .orderBy(xxhash64(col(vecCol)), col(vecCol))
      .limit(fitSample).collect()
      .map(vecOf(_, 0))
    if (sample.isEmpty)
      IvfIndex(df.withColumn("__cell", lit(null).cast("int")),
        Array.empty[Array[Double]])
    else {
      val centroids = localKMeans(sample, math.min(nCentroids, sample.length), seed)
      val assigned = df.withColumn("__cell",
        element_at(nearestCells(centroids, 1)(col(vecCol)), 1)).persist()
      IvfIndex(assigned, centroids)
    }
  }

  /** Memoized [[ivfBuild]] for the same session + corpus plan + params.
    * The (possibly multi-second, cluster-wide) build runs OUTSIDE the
    * registry lock — concurrent lookups of other corpora never block
    * behind it; a lost duplicate-build race releases its frame.
    */
  def ivfIndexFor(df: DataFrame, vecCol: String, nCentroids: Int,
      seed: Long): IvfIndex = {
    val key = corpusKey(df, (vecCol, Integer.valueOf(nCentroids), java.lang.Long.valueOf(seed)))
    ivfIndexes.synchronized(Option(ivfIndexes.get(key))).getOrElse {
      val built = ivfBuild(df, vecCol, nCentroids, seed)
      ivfIndexes.synchronized {
        Option(ivfIndexes.get(key)) match {
          case Some(winner) => built.release(); winner
          case None => ivfIndexes.put(key, built); built
        }
      }
    }
  }

  /** Incremental index maintenance — FAISS `IndexIVF.add()` semantics:
    * new vectors are assigned to the EXISTING centroids and unioned
    * into the assignment; the quantizer is frozen, so no re-clustering,
    * no touch of the existing corpus, and
    * `probe(insert(idx, Δ)) ≡ probe(index built over corpus ∪ Δ with
    * the same centroids)` exactly (spec-pinned). The trade every IVF
    * deployment makes: recall degrades only as far as the data
    * DISTRIBUTION drifts from the trained quantizer — rebuilds are the
    * periodic offline path, inserts ride the frozen one nightly.
    *
    * The returned index shares the base's pinned assignment blocks
    * (the delta stays lazy — at 100 TB you don't re-pin the corpus to
    * add a day of embeddings); release the BASE index when done.
    */
  def ivfInsert(index: IvfIndex, delta: DataFrame, vecCol: String): IvfIndex = {
    require(index.centroids.nonEmpty,
      "cannot insert into an empty (centroid-less) index — build first")
    val assignedDelta = delta.withColumn("__cell",
      element_at(nearestCells(index.centroids, 1)(col(vecCol)), 1))
    IvfIndex(index.assigned.unionByName(assignedDelta), index.centroids)
  }

  /** Disk twin of [[ivfInsert]]: fold a vector delta into a WRITTEN
    * index layout by appending its assigned rows into the same
    * `partitionBy("__cell")` directory tree — existing files are never
    * rewritten (each cell directory gains one delta file), the centroid
    * table is untouched, and probes over [[readIndex]] keep their
    * partition pruning over base + delta alike. This is the nightly
    * embedding-pipeline shape: cluster once, append forever, re-cluster
    * on schedule.
    */
  def appendIndex(spark: SparkSession, path: String, delta: DataFrame,
      vecCol: String): Unit =
    // same lock scope as compactIndex and writeIndex (r18 review): an
    // append racing a compact would land its committed delta in the
    // tree the swap is about to delete (or worse, inside the
    // retire→promote window), and racing a re-cluster it would assign
    // against stale centroids — rows probes can never find. Append-only
    // and NOT idempotent, like TokenCorpus.append: a replayed delta
    // double-inserts; retries need an external applied-marker.
    withTreeLock(spark, s"$path/assigned") {
      val idx = readIndex(spark, path)
      require(idx.centroids.nonEmpty,
        s"index at $path has no centroids — nothing to assign against")
      delta.withColumn("__cell",
          element_at(nearestCells(idx.centroids, 1)(col(vecCol)), 1))
        .write.mode("append").partitionBy("__cell").parquet(s"$path/assigned")
    }

  /** Persist a built index to storage: the assignment partitioned by
    * cell — the on-disk layout that turns a probe's cell list into
    * partition pruning (only ~nProbe/nCentroids of the files are read)
    * — plus the tiny centroid table.
    */
  def writeIndex(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    // the write spans TWO sibling dirs with no atomic rename over both:
    // the seal marker is deleted FIRST and re-created LAST (r18 review),
    // so a crash between the overwrites — which would leave a NEW
    // assignment under OLD centroids, silently mis-probed — reads as
    // "no sealed index here" instead of wrong neighbors. Same lock
    // scope as append/compact: an overlapping rebuild is the stale-
    // centroid race appendIndex's doc names.
    withTreeLock(spark, s"$path/assigned") {
      unseal(spark, path)
      // an empty index has zero rows: partitionBy would emit no parquet
      // footers at all and the read side couldn't infer a schema — write
      // it unpartitioned (schema-only) instead
      if (index.centroids.isEmpty)
        index.assigned.write.mode("overwrite").parquet(s"$path/assigned")
      else
        index.assigned.write.mode("overwrite")
          .partitionBy("__cell").parquet(s"$path/assigned")
      import spark.implicits._
      index.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
      seal(spark, path)
    }
  }

  /** The written-index consistency seal: `_graft_index_sealed` under
    * `path`, deleted before a multi-directory overwrite begins and
    * re-created after its last part lands. Readers refuse an unsealed
    * tree — a crashed rebuild must be loud, never a silent wrong-recall
    * probe. Appends never touch it (they add files to ONE dir; the tree
    * stays internally consistent throughout).
    */
  private def sealPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_index_sealed")
  private def seal(spark: SparkSession, path: String): Unit = {
    val p = sealPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true); out.close()
  }
  private def unseal(spark: SparkSession, path: String): Unit = {
    val p = sealPath(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
  }
  private def requireSealed(spark: SparkSession, path: String): Unit = {
    val p = sealPath(path)
    require(p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p),
      s"index at $path is not sealed — a writeIndex either never " +
        "completed here or crashed mid-overwrite (its parts may be " +
        "mutually inconsistent); rebuild and re-write the index")
  }

  private def withTreeLock[A](spark: SparkSession, dir: String)(body: => A): A = {
    val lockPath = new org.apache.hadoop.fs.Path(dir + "__maintenance.lock")
    val fs = lockPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    MaintenanceLock.withLock(fs, lockPath)(body)
  }

  /** Read a written index back; `assigned` is the partitioned scan, so
    * probes prune by `__cell` (dynamic partition pruning against the
    * broadcast probe list). Pins nothing. Refuses an unsealed tree.
    */
  def readIndex(spark: SparkSession, path: String): IvfIndex = {
    requireSealed(spark, path)
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
    IvfIndex(spark.read.parquet(s"$path/assigned"), centroids)
  }

  /** Online half: rank the nProbe nearest cells per query row INSIDE
    * the plan (the centroid table is a driver-side kernel constant — no
    * corpus action), then equi-join the probed cells against the
    * assignment and take the exact cosine top-k within them.
    */
  def ivfProbe(index: IvfIndex, query: DataFrame, vecCol: String,
      idCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val qCells = query.select(col(vecCol).as("__q"))
      .withColumn("__cell",
        explode(nearestCells(index.centroids, nProbe)(col("__q"))))
    index.assigned.join(broadcast(qCells), "__cell")
      .select(col(idCol), round(cosine(col(vecCol), col("__q")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Batched probe: per-query top-k for every row of `query` against
    * one index — a single equi-join (all queries' probed cells on the
    * build side) plus a per-query ranked window, not a loop of probes.
    */
  def ivfProbeBatch(index: IvfIndex, query: DataFrame, vecCol: String,
      idCol: String, queryIdCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val qCells = query.select(col(queryIdCol).as("query_id"), col(vecCol).as("__q"))
      .withColumn("__cell",
        explode(nearestCells(index.centroids, nProbe)(col("__q"))))
    perQueryTopK(index.assigned.join(broadcast(qCells), "__cell"), vecCol, idCol, k)
  }

  /** IVF (inverted-file) ANN: k-means the corpus into `nCentroids`
    * cells offline ([[ivfBuild]], memoized per corpus), then probe only
    * the `nProbe` cells whose centroids are nearest the query — the
    * standard billion-scale ANN layout; a probe touches
    * ~nProbe/nCentroids of the corpus.
    */
  def ivfTopK(df: DataFrame, query: DataFrame, vecCol: String, idCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame =
    ivfProbe(ivfIndexFor(df, vecCol, nCentroids, seed), query, vecCol, idCol,
      k, nProbe)

  // ---------------------------------------------------------------- LSH

  /** A built LSH index: the corpus with its hyperplane-sign bucket
    * precomputed once (persisted for repeated probes). At 100 TB the
    * bucketed frame is written `partitionBy("__bucket")` /
    * `bucketBy` instead, the same layout move as [[writeIndex]].
    */
  final case class LshIndex(bucketed: DataFrame, nPlanes: Int, dim: Int, seed: Long) {
    def release(): Unit = bucketed.unpersist(blocking = false)
  }

  /** Offline half: attach `__bucket` to every corpus row in one map
    * pass.
    */
  def lshBuild(df: DataFrame, vecCol: String, nPlanes: Int = 4, dim: Int = 64,
      seed: Long = 42L): LshIndex =
    LshIndex(
      df.withColumn("__bucket", bucketId(col(vecCol), nPlanes, dim, seed)).persist(),
      nPlanes, dim, seed)

  /** Persist a built LSH index partitioned by bucket — probes against
    * the read-back index prune the scan to the probed buckets (same
    * layout move as [[writeIndex]]).
    */
  def lshWriteIndex(index: LshIndex, path: String): Unit = {
    index.bucketed.write.mode("overwrite")
      .partitionBy("__bucket").parquet(s"$path/bucketed")
    val spark = index.bucketed.sparkSession
    import spark.implicits._
    Seq((index.nPlanes, index.dim, index.seed)).toDF("nPlanes", "dim", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** Read a written LSH index back; pins nothing. */
  def lshReadIndex(spark: SparkSession, path: String): LshIndex = {
    val p = spark.read.parquet(s"$path/params").head()
    LshIndex(spark.read.parquet(s"$path/bucketed"),
      p.getInt(p.fieldIndex("nPlanes")),
      p.getInt(p.fieldIndex("dim")),
      p.getLong(p.fieldIndex("seed")))
  }

  /** Memoized [[lshBuild]] for the same session + corpus plan + params
    * (including `vecCol` — a second vector column on the same corpus is
    * a different index). Build runs outside the registry lock, like
    * [[ivfIndexFor]].
    */
  def lshIndexFor(df: DataFrame, vecCol: String, nPlanes: Int, dim: Int,
      seed: Long): LshIndex = {
    val key = corpusKey(df,
      (vecCol, Integer.valueOf(nPlanes), Integer.valueOf(dim),
        java.lang.Long.valueOf(seed), "lsh"))
    lshIndexes.synchronized(Option(lshIndexes.get(key))).getOrElse {
      val built = lshBuild(df, vecCol, nPlanes, dim, seed)
      lshIndexes.synchronized {
        Option(lshIndexes.get(key)) match {
          case Some(winner) => built.release(); winner
          case None => lshIndexes.put(key, built); built
        }
      }
    }
  }

  /** Query-side multi-probe list: each query row exploded to its own
    * bucket plus every hamming-1 neighbor (nPlanes+1 ints). Shared by
    * the single and batched probes so the probe semantics can't drift.
    */
  private def lshProbes(index: LshIndex, query: DataFrame, vecCol: String,
      queryIdCol: Option[String]): DataFrame = {
    val masks = array((lit(0) +: (0 until index.nPlanes).map(i => lit(1 << i))): _*)
    val base = queryIdCol match {
      case Some(q) => query.select(col(q).as("query_id"), col(vecCol).as("__q"))
      case None => query.select(col(vecCol).as("__q"))
    }
    base
      .withColumn("__qb", bucketId(col("__q"), index.nPlanes, index.dim, index.seed))
      .withColumn("__bucket", explode(transform(masks, m => col("__qb").bitwiseXOR(m))))
      .drop("__qb")
  }

  /** Online half: equi-join the exploded multi-probe bucket list
    * against the bucketed corpus; exact cosine top-k within the
    * candidates. The corpus-side bucket comes from the index — a probe
    * computes NO per-corpus-row work and, over a partitioned on-disk
    * index, scans only the probed buckets.
    */
  def lshProbe(index: LshIndex, query: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame =
    index.bucketed.join(broadcast(lshProbes(index, query, vecCol, None)), "__bucket")
      .select(col(idCol), round(cosine(col(vecCol), col("__q")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** Batched LSH probe: per-query top-k in one equi-join + ranked
    * window (see [[ivfProbeBatch]]).
    */
  def lshProbeBatch(index: LshIndex, query: DataFrame, vecCol: String,
      idCol: String, queryIdCol: String, k: Int): DataFrame =
    perQueryTopK(
      index.bucketed.join(
        broadcast(lshProbes(index, query, vecCol, Some(queryIdCol))), "__bucket"),
      vecCol, idCol, k)

  /** LSH ANN: bucket the corpus by hyperplane signs offline
    * ([[lshBuild]], memoized per corpus), probe the query's bucket plus
    * all hamming-1 buckets, then exact cosine top-k within candidates.
    */
  def lshTopK(df: DataFrame, query: DataFrame, vecCol: String, idCol: String,
      k: Int, nPlanes: Int = 4, dim: Int = 64, seed: Long = 42L): DataFrame =
    lshProbe(lshIndexFor(df, vecCol, nPlanes, dim, seed), query, vecCol, idCol, k)

  // ----------------------------------------------------------------- PQ

  /** A built product-quantization index: the corpus reduced to
    * (id, m-code array) — the raw vectors are GONE from the searchable
    * representation, which is the whole point: at 100 TB the codes
    * table is ~d·4/m-fold smaller than the embeddings (64-dim floats at
    * m=8 → 32× before code packing), small enough to keep hot while the
    * full vectors stay on cold storage and are touched only for the
    * re-rank candidates. `codebooks(s)(c)` is subspace s's centroid c.
    */
  final case class PqIndex(codes: DataFrame,
      codebooks: Array[Array[Array[Double]]], dim: Int, idCol: String) {
    def subDim: Int = dim / codebooks.length
    def release(): Unit = codes.unpersist(blocking = false)
  }

  private val pqIndexes = lruMap[PqIndex](_.release())

  /** Offline half: train `m` independent subspace codebooks (k
    * centroids each) on the same bounded deterministic sample as
    * [[ivfBuild]], then encode every corpus row to its m nearest
    * subspace-centroid ids in one codegen map pass
    * ([[org.apache.spark.sql.graft.PqEncode]]). Only (id, codes)
    * persists — the encode job is the last time the build touches the
    * raw vectors.
    */
  def pqBuild(df: DataFrame, vecCol: String, idCol: String, m: Int = 8,
      k: Int = 16, seed: Long = 42L, fitSample: Int = 4096): PqIndex = {
    val sample = df.select(col(vecCol))
      .orderBy(xxhash64(col(vecCol)), col(vecCol))
      .limit(fitSample).collect()
      .map(vecOf(_, 0))
    if (sample.isEmpty)
      // empty fit sample = empty corpus: a schema-only index (persisted
      // so release() is symmetric with the built path); pqProbe detects
      // codebooks.isEmpty and short-circuits to an empty top-k rather
      // than dividing by the zero dim
      return PqIndex(
        df.select(col(idCol),
          lit(null).cast("array<int>").as("__codes")).persist(),
        Array.empty, 0, idCol)
    val dim = sample.head.length
    require(dim % m == 0, s"pqBuild: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val codebooks = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      // per-subspace seed: identical subspace data must not be forced
      // onto identical codebooks by a shared RNG stream
      localKMeans(sub, math.min(k, sub.length), seed + s)
    }
    val codes = df.select(col(idCol),
      org.apache.spark.sql.graft.PqEncode.columnFor(col(vecCol), codebooks)
        .as("__codes")).persist()
    PqIndex(codes, codebooks, dim, idCol)
  }

  /** Memoized [[pqBuild]] (same discipline as [[ivfIndexFor]]). */
  def pqIndexFor(df: DataFrame, vecCol: String, idCol: String, m: Int,
      k: Int, seed: Long): PqIndex = {
    val key = corpusKey(df, (vecCol, idCol, Integer.valueOf(m),
      Integer.valueOf(k), java.lang.Long.valueOf(seed), "pq"))
    pqIndexes.synchronized(Option(pqIndexes.get(key))).getOrElse {
      val built = pqBuild(df, vecCol, idCol, m, k, seed)
      pqIndexes.synchronized {
        Option(pqIndexes.get(key)) match {
          case Some(winner) => built.release(); winner
          case None => pqIndexes.put(key, built); built
        }
      }
    }
  }

  /** Online half, two stages. Stage 1 (ADC scan): score every code row
    * with m table lookups against the query's precomputed per-subspace
    * LUTs ([[org.apache.spark.sql.graft.PqAdcScore]]) and take the
    * `k·rerankFactor` best approximate candidates — a
    * TakeOrderedAndProject over the compressed table; the raw vectors
    * are never read. Stage 2 (re-rank): join only those candidates back
    * to the full-vector corpus (candidate list broadcast — it is
    * k·rerankFactor rows) and return the EXACT cosine top-k among them.
    * Recall is tuned by rerankFactor, cost by m/k — the standard
    * IVF-PQ split with the IVF stage elided (compose with [[ivfBuild]]
    * cells for the full billion-scale layout).
    *
    * The single-row query collect is bounded (one vector) — the same
    * driver-side constant discipline as the IVF centroid table.
    */
  def pqProbe(index: PqIndex, df: DataFrame, query: DataFrame,
      vecCol: String, idCol: String, k: Int, rerankFactor: Int = 4): DataFrame = {
    // an index built over an empty corpus has no codebooks (and dim 0):
    // the probe of an empty corpus is an empty top-k, not a div-by-zero
    if (index.codebooks.isEmpty)
      return df.select(col(idCol), lit(0.0d).as("cos")).limit(0)
    val qRow = query.select(col(vecCol)).head()
    val q = vecOf(qRow, 0)
    require(q.length == index.dim,
      s"pqProbe: query dim ${q.length} != index dim ${index.dim}")
    val m = index.codebooks.length
    val subDim = index.subDim
    val lutDot = Array.tabulate(m) { s =>
      index.codebooks(s).map { cent =>
        var acc = 0.0; var i = 0
        while (i < subDim) { acc += q(s * subDim + i) * cent(i); i += 1 }
        acc
      }
    }
    val lutSq = Array.tabulate(m) { s =>
      index.codebooks(s).map { cent =>
        var acc = 0.0; var i = 0
        while (i < subDim) { acc += cent(i) * cent(i); i += 1 }
        acc
      }
    }
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val candidates = index.codes
      .select(col(index.idCol),
        org.apache.spark.sql.graft.PqAdcScore.columnFor(
          col("__codes"), lutDot, lutSq, qNorm).as("__adc"))
      .orderBy(col("__adc").desc, col(index.idCol))
      .limit(k * rerankFactor)
      .select(col(index.idCol).as(idCol))
    df.join(broadcast(candidates), idCol)
      .crossJoin(broadcast(query.select(col(vecCol).as("__q"))))
      .select(col(idCol), round(cosine(col(vecCol), col("__q")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** PQ ANN: compress the corpus to m-code rows offline ([[pqBuild]],
    * memoized), ADC-scan the compressed table online, exact re-rank of
    * the candidate head.
    */
  def pqTopK(df: DataFrame, query: DataFrame, vecCol: String, idCol: String,
      k: Int, m: Int = 8, nCodes: Int = 16, seed: Long = 42L,
      rerankFactor: Int = 4): DataFrame =
    pqProbe(pqIndexFor(df, vecCol, idCol, m, nCodes, seed), df, query,
      vecCol, idCol, k, rerankFactor)

  // ------------------------------------------------------------- IVF-PQ

  /** The composed billion-scale layout: PQ codes stored INSIDE IVF
    * cells — `codes` is (id, __cell, __codes), so a probe prunes to the
    * nProbe nearest cells first AND scans only compressed codes inside
    * them, then exact-re-ranks the candidate head against the raw
    * vectors. Relative to IVF alone the probed bytes shrink ~d·4/m-fold
    * (64-dim floats at m=8 → 32×), which is the budget a deployment
    * spends on MORE probed cells: equal scanned bytes buys ~32× the
    * cell coverage, and recall follows (AnnSpec pins that trade on the
    * fixture). Codes encode the RAW vectors (FAISS `by_residual=false`
    * mode) — residual encoding buys precision per code at the cost of
    * coupling the two quantizers; the exact re-rank stage already
    * restores precision here, so the simpler layout wins.
    */
  final case class IvfPqIndex(codes: DataFrame,
      centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], dim: Int, idCol: String) {
    def subDim: Int = dim / codebooks.length
    def release(): Unit = codes.unpersist(blocking = false)
  }

  private val ivfPqIndexes = lruMap[IvfPqIndex](_.release())

  /** Offline half: ONE bounded deterministic sample trains both
    * quantizers (coarse k-means cells + m subspace codebooks), then a
    * single distributed map pass assigns every row its cell AND its m
    * codes — the raw vectors are read once at build and only for
    * re-rank candidates ever after.
    */
  def ivfPqBuild(df: DataFrame, vecCol: String, idCol: String,
      nCentroids: Int = 16, m: Int = 8, k: Int = 16, seed: Long = 42L,
      fitSample: Int = 4096): IvfPqIndex = {
    val sample = df.select(col(vecCol))
      .orderBy(xxhash64(col(vecCol)), col(vecCol))
      .limit(fitSample).collect()
      .map(vecOf(_, 0))
    if (sample.isEmpty)
      return IvfPqIndex(
        df.select(col(idCol), lit(null).cast("int").as("__cell"),
          lit(null).cast("array<int>").as("__codes")).persist(),
        Array.empty, Array.empty, 0, idCol)
    val dim = sample.head.length
    require(dim % m == 0, s"ivfPqBuild: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val centroids = localKMeans(sample, math.min(nCentroids, sample.length), seed)
    val codebooks = Array.tabulate(m) { s =>
      val sub = sample.map(v =>
        java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      localKMeans(sub, math.min(k, sub.length), seed + s)
    }
    val codes = df.select(col(idCol),
      element_at(nearestCells(centroids, 1)(col(vecCol)), 1).as("__cell"),
      org.apache.spark.sql.graft.PqEncode.columnFor(col(vecCol), codebooks)
        .as("__codes")).persist()
    IvfPqIndex(codes, centroids, codebooks, dim, idCol)
  }

  /** Memoized [[ivfPqBuild]] (same discipline as [[ivfIndexFor]]). */
  def ivfPqIndexFor(df: DataFrame, vecCol: String, idCol: String,
      nCentroids: Int, m: Int, k: Int, seed: Long): IvfPqIndex = {
    val key = corpusKey(df, (vecCol, idCol, Integer.valueOf(nCentroids),
      Integer.valueOf(m), Integer.valueOf(k), java.lang.Long.valueOf(seed), "ivfpq"))
    ivfPqIndexes.synchronized(Option(ivfPqIndexes.get(key))).getOrElse {
      val built = ivfPqBuild(df, vecCol, idCol, nCentroids, m, k, seed)
      ivfPqIndexes.synchronized {
        Option(ivfPqIndexes.get(key)) match {
          case Some(winner) => built.release(); winner
          case None => ivfPqIndexes.put(key, built); built
        }
      }
    }
  }

  /** Online half, three stages: (1) rank the nProbe nearest cells on
    * the driver (the centroid matrix is a kernel constant — same
    * discipline as [[ivfProbe]]'s plan-side rank, but here the list
    * must be a LITERAL so the disk layout's cell filter becomes STATIC
    * partition pruning, stronger than dynamic); (2) ADC-scan only the
    * probed cells' code rows; (3) exact cosine re-rank of the
    * k·rerankFactor candidate head against the raw vectors.
    */
  def ivfPqProbe(index: IvfPqIndex, df: DataFrame, query: DataFrame,
      vecCol: String, idCol: String, k: Int, nProbe: Int = 4,
      rerankFactor: Int = 4): DataFrame = {
    if (index.codebooks.isEmpty)
      return df.select(col(idCol), lit(0.0d).as("cos")).limit(0)
    val q = vecOf(query.select(col(vecCol)).head(), 0).map(_.toFloat)
      .toArray.map(_.toDouble)
    require(q.length == index.dim,
      s"ivfPqProbe: query dim ${q.length} != index dim ${index.dim}")
    // driver-side coarse rank, same L2 metric as NearestCells/localKMeans
    val cells = index.centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0; var j = 0
      while (j < c.length) { val t = q(j) - c(j); d += t * t; j += 1 }
      (d, i)
    }.sortBy(x => (x._1, x._2)).take(nProbe).map(_._2) // 0-based cell ids
    val m = index.codebooks.length
    val subDim = index.subDim
    val lutDot = Array.tabulate(m) { s =>
      index.codebooks(s).map { cent =>
        var acc = 0.0; var i = 0
        while (i < subDim) { acc += q(s * subDim + i) * cent(i); i += 1 }
        acc
      }
    }
    val lutSq = Array.tabulate(m) { s =>
      index.codebooks(s).map { cent =>
        var acc = 0.0; var i = 0
        while (i < subDim) { acc += cent(i) * cent(i); i += 1 }
        acc
      }
    }
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val candidates = index.codes
      .filter(col("__cell").isin(cells.toIndexedSeq: _*))
      .select(col(index.idCol),
        org.apache.spark.sql.graft.PqAdcScore.columnFor(
          col("__codes"), lutDot, lutSq, qNorm).as("__adc"))
      .orderBy(col("__adc").desc, col(index.idCol))
      .limit(k * rerankFactor)
      .select(col(index.idCol).as(idCol))
    df.join(broadcast(candidates), idCol)
      .crossJoin(broadcast(query.select(col(vecCol).as("__q"))))
      .select(col(idCol), round(cosine(col(vecCol), col("__q")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Incremental IVF-PQ maintenance — FAISS `IndexIVFPQ.add()`
    * semantics with BOTH quantizers frozen: new vectors are assigned
    * to the existing coarse cells AND encoded against the existing
    * codebooks, then unioned into the code table. No re-clustering, no
    * touch of the existing corpus, and
    * `probe(insert(idx, Δ)) ≡ probe(index built over corpus ∪ Δ with
    * the same quantizers)` exactly (spec-pinned) — the [[ivfInsert]]
    * trade, compounded: recall drifts only as far as the data
    * distribution drifts from BOTH trained quantizers.
    */
  def ivfPqInsert(index: IvfPqIndex, delta: DataFrame,
      vecCol: String): IvfPqIndex = {
    require(index.codebooks.nonEmpty,
      "cannot insert into an empty (untrained) IVF-PQ index — build first")
    val assigned = delta.select(col(index.idCol),
      element_at(nearestCells(index.centroids, 1)(col(vecCol)), 1).as("__cell"),
      org.apache.spark.sql.graft.PqEncode.columnFor(col(vecCol), index.codebooks)
        .as("__codes"))
    IvfPqIndex(index.codes.unionByName(assigned), index.centroids,
      index.codebooks, index.dim, index.idCol)
  }

  /** Disk twin of [[ivfPqInsert]]: append the delta's (id, cell, codes)
    * rows into the written `partitionBy("__cell")` tree — existing
    * files never rewritten, quantizer tables untouched, probes keep
    * their static cell pruning over base + delta alike.
    */
  def ivfPqAppendIndex(spark: SparkSession, path: String, delta: DataFrame,
      vecCol: String): Unit =
    // same lock + replay contract as [[appendIndex]] (r18 review)
    withTreeLock(spark, s"$path/codes") {
      val idx = ivfPqReadIndex(spark, path)
      require(idx.codebooks.nonEmpty,
        s"IVF-PQ index at $path is untrained — nothing to assign against")
      delta.select(col(idx.idCol),
          element_at(nearestCells(idx.centroids, 1)(col(vecCol)), 1).as("__cell"),
          org.apache.spark.sql.graft.PqEncode.columnFor(col(vecCol), idx.codebooks)
            .as("__codes"))
        .write.mode("append").partitionBy("__cell").parquet(s"$path/codes")
    }

  /** Disk layout: code rows `partitionBy("__cell")` (a probe's literal
    * cell list prunes at LISTING time), plus the tiny centroid and
    * codebook tables — the same one-time layout move as [[writeIndex]].
    */
  def ivfPqWriteIndex(index: IvfPqIndex, path: String): Unit = {
    val spark = index.codes.sparkSession
    // FOUR sibling dirs, no atomic rename over them: seal-delete first,
    // seal-create last, under the tree lock — a crash mid-overwrite
    // (e.g. old codebook LUTs against new codes → garbage ADC
    // candidates) must read as "unsealed", never as wrong neighbors
    withTreeLock(spark, s"$path/codes") {
      unseal(spark, path)
      if (index.codebooks.isEmpty)
        index.codes.write.mode("overwrite").parquet(s"$path/codes")
      else
        index.codes.write.mode("overwrite")
          .partitionBy("__cell").parquet(s"$path/codes")
      import spark.implicits._
      index.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
      index.codebooks.zipWithIndex.flatMap { case (cb, s) =>
        cb.zipWithIndex.map { case (cent, c) => (s, c, cent.toSeq) }
      }.toSeq.toDF("subspace", "code", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
      Seq((index.dim, index.idCol)).toDF("dim", "id_col")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
      seal(spark, path)
    }
  }

  /** Read a written IVF-PQ index back; probes over it prune code
    * partitions statically from the literal cell list. Refuses an
    * unsealed tree.
    */
  def ivfPqReadIndex(spark: SparkSession, path: String): IvfPqIndex = {
    requireSealed(spark, path)
    val meta = spark.read.parquet(s"$path/meta").head()
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toArray)
    val codebooks = spark.read.parquet(s"$path/codebooks")
      .orderBy("subspace", "code").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.map(r => r.getSeq[Double](2).toArray).toArray).toArray
    IvfPqIndex(spark.read.parquet(s"$path/codes"), centroids, codebooks,
      meta.getInt(0), meta.getString(1))
  }

  /** IVF-PQ ANN: coarse cells prune the corpus, PQ codes compress the
    * scan inside them, exact re-rank restores precision — the
    * production shape at 10⁹+ vectors.
    */
  def ivfPqTopK(df: DataFrame, query: DataFrame, vecCol: String,
      idCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      m: Int = 8, nCodes: Int = 16, seed: Long = 42L,
      rerankFactor: Int = 4): DataFrame =
    ivfPqProbe(ivfPqIndexFor(df, vecCol, idCol, nCentroids, m, nCodes, seed),
      df, query, vecCol, idCol, k, nProbe, rerankFactor)

  /** Cell-tree compaction shared by [[compactIndex]] and
    * [[ivfPqCompactIndex]] (r16 verdict #1c): every
    * [[appendIndex]]/[[ivfPqAppendIndex]] adds one file to each touched
    * `__cell=` directory, so after months of nightly deltas a probe's
    * pruned read pays per-FILE open/footer overhead that dwarfs the
    * data. Rewrite the tree so each cell holds ONE file again:
    * repartition on `__cell` (each cell lands wholly in one task, and
    * the partitioned writer emits one file per cell value per task),
    * write beside the live tree, then swap with two renames. The swap
    * is not atomic for concurrent readers — this is the offline
    * maintainer's op, scheduled like the re-cluster itself; an online
    * deployment wraps the same rewrite in the versioned-pointer flip
    * the upsert sink uses. Quantizer tables are untouched; probe
    * results and partition pruning are byte-identical before/after
    * (spec-pinned).
    */
  private def compactCellTree(spark: SparkSession, dir: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(dir + "__compact")
    val retired = new org.apache.hadoop.fs.Path(dir + "__old")
    // a missing live tree next to surviving swap copies is the crashed-
    // mid-swap state, not a bad path — name the recovery instead of a
    // bare not-found (r17 ADVICE)
    require(fs.exists(live), s"no index tree at $dir" + (
      if (fs.exists(retired) || fs.exists(staged))
        s" — a previous compact crashed mid-swap; recover by renaming " +
          s"$retired (original) or $staged (compacted) to $dir by hand"
      else ""))
    // single-maintainer contract made checkable (r17 verdict #5): the
    // two-rename swap below is exactly what two concurrent compacts race
    val lockPath = new org.apache.hadoop.fs.Path(dir + "__maintenance.lock")
    MaintenanceLock.withLock(fs, lockPath) {
    fs.delete(staged, true); fs.delete(retired, true)
    spark.read.parquet(dir)
      .repartition(col("__cell"))
      .write.partitionBy("__cell").parquet(staged.toString)
    require(fs.rename(live, retired), s"could not retire $live")
    // the two-rename swap has a crash window between retire and promote
    // in which NO tree exists at dir (r17 ADVICE): if the promote fails,
    // roll the retired copy back so readers (and a re-run's
    // require(exists)) still find the live tree; if even the rollback
    // fails, name the surviving copies — mirroring Bucketing.compact's
    // recovery breadcrumb — instead of leaving a silent empty slot
    if (!fs.rename(staged, live)) {
      val rolledBack = fs.rename(retired, live)
      throw new IllegalStateException(
        s"compact($dir) failed to promote the rewritten tree at $staged" +
          (if (rolledBack) s" — the original tree was rolled back to $dir " +
            s"(still fragmented); delete $staged and re-run"
           else s" AND could not roll the original back from $retired — " +
            s"recover by renaming $retired (original) or $staged " +
            s"(compacted, complete) to $dir by hand"))
    }
    fs.delete(retired, true)
    }
  }

  /** File count per `__cell=` directory of a written index tree — the
    * compaction trigger signal, answered from a listing (the cell-tree
    * twin of [[Bucketing.filesPerBucket]]).
    */
  private def filesPerCell(spark: SparkSession, dir: String): Map[String, Int] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Map.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__cell="))
      .map { st =>
        st.getPath.getName ->
          fs.listStatus(st.getPath).count(_.getPath.getName.endsWith(".parquet"))
      }.toMap
  }

  private def compactCellTreeIfNeeded(spark: SparkSession, dir: String,
      maxFilesPerCell: Int): Boolean = {
    require(maxFilesPerCell >= 1, "threshold must be >= 1")
    val worst = filesPerCell(spark, dir).values.maxOption.getOrElse(0)
    val run = worst > maxFilesPerCell
    if (run) compactCellTree(spark, dir)
    run
  }

  /** Compact a written IVF index's appended assignment tree — one file
    * per cell again, pruning and probe results unchanged.
    */
  def compactIndex(spark: SparkSession, path: String): Unit =
    compactCellTree(spark, s"$path/assigned")

  /** [[compactIndex]] when any cell's file count exceeds the threshold
    * — the nightly-maintenance guard, scheduled after the appends.
    * Returns true iff a rewrite ran.
    */
  def compactIndexIfNeeded(spark: SparkSession, path: String,
      maxFilesPerCell: Int = 4): Boolean =
    compactCellTreeIfNeeded(spark, s"$path/assigned", maxFilesPerCell)

  /** Compact a written IVF-PQ index's appended code tree — one file per
    * cell again, pruning and probe results unchanged.
    */
  def ivfPqCompactIndex(spark: SparkSession, path: String): Unit =
    compactCellTree(spark, s"$path/codes")

  /** [[ivfPqCompactIndex]] behind the same file-count threshold. */
  def ivfPqCompactIndexIfNeeded(spark: SparkSession, path: String,
      maxFilesPerCell: Int = 4): Boolean =
    compactCellTreeIfNeeded(spark, s"$path/codes", maxFilesPerCell)
}
