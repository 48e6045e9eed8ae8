package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, NearDup}

/** Round-4 hardening coverage: operator cache lifecycle (nothing stays
  * pinned after the consuming action + release), the LSH/IVF index
  * split, the on-disk IVF layout, batched probes, and the ε-grid
  * losslessness claim.
  */
class CacheHygieneSpec extends SparkSpec {

  test("dedup + ANN family leaves no persisted RDDs once consumed and released") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    NearDup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5).count()
    NearDup.minHashLshPairs(docs, "doc_id", "text", threshold = 0.5).count()
    NearDup.simHashPairs(docs, "doc_id", "text", maxHamming = 3).count()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val query = emb.filter(col("vec_id") === 0)
    val rest = emb.filter(col("vec_id") =!= 0)
    Ann.ivfTopK(rest, query, "embedding", "vec_id", 5).count()
    Ann.lshTopK(rest, query, "embedding", "vec_id", 5).count()
    // indexes are long-lived BY DESIGN (memoized probes); release is the
    // explicit session-teardown API
    Ann.clearIndexes()
    // NearDup release listeners fire on the listener-bus thread
    org.apache.spark.sql.graft.ListenerBus.flush(spark)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDD ids: $leaked")
  }

  test("near-dup results are identical on a second invocation (caches rebuilt cleanly)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    def run() = NearDup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .orderBy("a", "b").collect().toSeq
    assert(run() == run())
  }

  test("checkpoint-backed results survive >64 unrelated actions before consumption") {
    // the r6 advice defect: MaxMissedActions expiry released checkpoint
    // blocks of a NOT-yet-consumed result, so a late consumer failed on
    // missing blocks. Results with checkpoint-backed intermediates must
    // never miss-expire — only lazy persists (which allocated nothing) do.
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    // distributed path -> a real localCheckpoint backs the assignment
    val kept = graft.operators.ConnectedComponents
      .dedupByComponent(nodes, edges, "id", "a", "b", driverThreshold = 0L)
    // 70 unrelated actions: enough to trip the old 64-miss expiry
    (1 to 70).foreach(i => spark.range(i).count())
    org.apache.spark.sql.graft.ListenerBus.flush(spark)
    // the late consumer must still materialize correctly
    assert(kept.as[Long].collect().sorted.toSeq == Seq(1L, 4L, 5L))
    org.apache.spark.sql.graft.ListenerBus.flush(spark)
  }
}

class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val query = emb.filter(col("vec_id") === 0)
  private lazy val rest = emb.filter(col("vec_id") =!= 0)

  test("indexed LSH probe returns the same top-k as the candidate-set definition") {
    // reference: per-row bucket + filter against the query bucket ∪
    // hamming-1 buckets (the pre-index formulation)
    val nPlanes = 4
    val bucketed = rest.withColumn("__bucket", Ann.bucketId(col("embedding"), nPlanes, 64))
    val qb = query.select(Ann.bucketId(col("embedding"), nPlanes, 64).as("__qb"),
      col("embedding").as("__q"))
    val expected = bucketed.crossJoin(broadcast(qb))
      .filter(col("__bucket") === col("__qb") ||
        array_contains(array((0 until nPlanes).map(i => col("__qb").bitwiseXOR(lit(1 << i))): _*),
          col("__bucket")))
      .select(col("vec_id"),
        round(graft.functions.VectorFunctions.cosine(col("embedding"), col("__q")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .as[(Long, Double)].collect().toSeq
    val got = Ann.lshTopK(rest, query, "embedding", "vec_id", 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == expected)
  }

  test("LSH probe plan is an equi-join on __bucket, not a filtered cross join") {
    val df = Ann.lshTopK(rest, query, "embedding", "vec_id", 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no hash join on __bucket:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"probe still scans all rows per query:\n$plan")
  }

  test("memoized indexes are distinct per vector column on the same corpus") {
    val two = rest.withColumn("neg", transform(col("embedding"), x => -x))
    val a = Ann.lshIndexFor(two, "embedding", 4, 64, 42L)
    val b = Ann.lshIndexFor(two, "neg", 4, 64, 42L)
    try assert(!(a eq b), "same index served for different vector columns")
    finally Ann.clearIndexes()
  }

  test("batched probes give each query its own top-k") {
    val queries = emb.filter(col("vec_id") < 3)
    val corpus = emb.filter(col("vec_id") >= 3)
    val batch = Ann.bruteForceTopKBatch(corpus, queries, "embedding", "vec_id", "vec_id", 5)
      .as[(Long, Long, Double)].collect().groupBy(_._1)
    assert(batch.keySet == Set(0L, 1L, 2L))
    (0L until 3L).foreach { q =>
      val single = Ann.bruteForceTopK(corpus, emb.filter(col("vec_id") === q),
        "embedding", "vec_id", 5).as[(Long, Double)].collect().toSeq
      val got = batch(q).sortBy(r => (-r._3, r._2)).map(r => (r._2, r._3)).toSeq
      assert(got == single, s"query $q batched != single")
    }
    // index-backed batch probes: same shape, per-query keys present
    val ivfB = Ann.ivfProbeBatch(Ann.ivfIndexFor(corpus, "embedding", 8, 42L),
      queries, "embedding", "vec_id", "vec_id", 5)
    assert(ivfB.select("query_id").distinct().count() == 3)
    val lshB = Ann.lshProbeBatch(Ann.lshIndexFor(corpus, "embedding", 4, 64, 42L),
      queries, "embedding", "vec_id", "vec_id", 5)
    assert(lshB.groupBy("query_id").count().filter(col("count") > 5).count() == 0)
    Ann.clearIndexes()
  }
}

class HyperplaneBucketSpec extends SparkSpec {
  import spark.implicits._

  test("native hyperplane bucket equals the HOF reference formulation") {
    // the pre-round-4 interpreted formulation, rebuilt inline: per
    // plane, aggregate(zip_with(vec, planeRow, x*w)) > 0 sets bit p
    val nPlanes = 4
    val dim = 64
    val hofBucket = {
      val ps = org.apache.spark.sql.graft.HyperplaneBucket.planes(nPlanes, dim, 42L)
      ps.zipWithIndex.map { case (p, i) =>
        when(aggregate(
          zip_with(col("embedding"), array(p.map(lit): _*), (x, w) => x.cast("double") * w),
          lit(0.0), (acc, x) => acc + x) > 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    val diff = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(Ann.bucketId(col("embedding"), nPlanes, dim).as("native"),
        hofBucket.as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("bucket ids stay within [0, 2^nPlanes)") {
    val bad = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(Ann.bucketId(col("embedding"), 4, 64).as("b"))
      .filter(col("b") < 0 || col("b") >= 16)
    assert(bad.count() == 0)
  }

  test("malformed vectors land in bucket 0, matching HOF null-poisoning") {
    // the HOF formulation null-padded a length mismatch and a null
    // element poisoned every plane's sum -> bucket 0; the native
    // expression must reproduce that, not compute a partial projection
    val rows: Seq[Seq[java.lang.Float]] = Seq(
      Seq.fill(3)(java.lang.Float.valueOf(1.0f)),                     // too short
      Seq.fill(70)(java.lang.Float.valueOf(1.0f)),                    // too long
      (Seq.fill(63)(java.lang.Float.valueOf(1.0f)) :+ null): Seq[java.lang.Float])
    val got = rows.toDF("embedding")
      .select(Ann.bucketId(col("embedding"), 4, 64).as("b"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 0, 0), s"malformed rows bucketed as $got")
  }

  test("nearest_cells gives malformed vectors the sentinel cell list") {
    // same convention as bucket-0 poisoning above: a dim mismatch or a
    // null element yields cells [0, 1, ...) deterministically, so a
    // malformed query still meets a malformed corpus row in cell 0
    // instead of ranking by a garbage partial distance
    import org.apache.spark.sql.graft.NearestCells
    val centroids = Array(Array(0.0, 0.0, 0.0), Array(10.0, 10.0, 10.0))
    val rows: Seq[Seq[java.lang.Float]] = Seq(
      Seq.fill(2)(java.lang.Float.valueOf(9.0f)),                     // too short
      Seq.fill(4)(java.lang.Float.valueOf(9.0f)),                     // too long
      Seq(java.lang.Float.valueOf(9.0f), null, java.lang.Float.valueOf(9.0f)),
      Seq.fill(3)(java.lang.Float.valueOf(9.0f)))                     // well-formed
    val got = rows.toDF("v")
      .select(NearestCells.columnFor(col("v"), centroids, 2).as("cells"))
      .as[Seq[Int]].collect().toSeq
    assert(got.take(3) == Seq(Seq(0, 1), Seq(0, 1), Seq(0, 1)),
      s"malformed rows got $got")
    // the well-formed row is genuinely ranked: (9,9,9) is nearer the
    // (10,10,10) centroid, so cell 1 leads — not the sentinel order
    assert(got(3) == Seq(1, 0), s"well-formed row ranked as ${got(3)}")
  }
}

class IvfDiskIndexSpec extends SparkSpec {
  import spark.implicits._

  test("written index reads back equivalent and probes with partition pruning") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val query = emb.filter(col("vec_id") === 0)
    val rest = emb.filter(col("vec_id") =!= 0)
    val built = Ann.ivfBuild(rest, "embedding", nCentroids = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    try {
      Ann.writeIndex(built, dir)
      val read = Ann.readIndex(spark, dir)
      assert(read.centroids.map(_.toSeq).toSeq == built.centroids.map(_.toSeq).toSeq)
      val fromBuilt = Ann.ivfProbe(built, query, "embedding", "vec_id", 10)
        .as[(Long, Double)].collect().toSeq
      val probe = Ann.ivfProbe(read, query, "embedding", "vec_id", 10)
      val fromDisk = probe.as[(Long, Double)].collect().toSeq
      assert(fromDisk == fromBuilt)
      // the layout's point: the probe's cell list prunes the scan to
      // the probed partitions (dynamic partition pruning against the
      // broadcast probe side)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") && plan.contains("dynamicpruning"),
        s"probe scan not partition-pruned:\n$plan")
    } finally {
      built.release()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ivfInsert: frozen-quantizer add ≡ same-centroid rebuild; disk append keeps pruning") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val query = emb.filter(col("vec_id") === 0)
    val base = emb.filter(col("vec_id") % 2 === 1 && col("vec_id") =!= 0)
    val delta = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") =!= 0)
    val built = Ann.ivfBuild(base, "embedding", nCentroids = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_add").toString
    try {
      val inserted = Ann.ivfInsert(built, delta, "embedding")
      val full = base.unionByName(delta)
      val fromInserted = Ann.ivfProbe(inserted, query, "embedding", "vec_id", 10)
        .as[(Long, Double)].collect().toSeq
      // exact semantics: the inserted index IS the index you'd get
      // assigning the full corpus against the SAME frozen centroids —
      // rebuild via an empty-but-trained shell so the assignment
      // expression is identical
      val shell = Ann.IvfIndex(inserted.assigned.limit(0), built.centroids)
      val fromRebuilt = Ann.ivfProbe(
        Ann.ivfInsert(shell, full, "embedding"), query, "embedding", "vec_id", 10)
        .as[(Long, Double)].collect().toSeq
      assert(fromInserted == fromRebuilt)
      // disk twin: write the base, append the delta, probe finds a
      // planted delta vector and the scan still partition-prunes
      Ann.writeIndex(built, dir)
      Ann.appendIndex(spark, dir, delta, "embedding")
      val read = Ann.readIndex(spark, dir)
      assert(read.assigned.count() == full.count())
      val probe = Ann.ivfProbe(read, query, "embedding", "vec_id", 10)
      assert(probe.as[(Long, Double)].collect().toSeq == fromInserted)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") && plan.contains("dynamicpruning"),
        s"appended index scan not partition-pruned:\n$plan")
    } finally {
      built.release()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("written LSH index reads back equivalent and probes with partition pruning") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val query = emb.filter(col("vec_id") === 0)
    val rest = emb.filter(col("vec_id") =!= 0)
    val built = Ann.lshBuild(rest, "embedding", nPlanes = 4, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh").toString
    try {
      Ann.lshWriteIndex(built, dir)
      val read = Ann.lshReadIndex(spark, dir)
      assert((read.nPlanes, read.dim, read.seed) == (built.nPlanes, built.dim, built.seed))
      val fromBuilt = Ann.lshProbe(built, query, "embedding", "vec_id", 10)
        .as[(Long, Double)].collect().toSeq
      val probe = Ann.lshProbe(read, query, "embedding", "vec_id", 10)
      val fromDisk = probe.as[(Long, Double)].collect().toSeq
      assert(fromDisk == fromBuilt)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") && plan.contains("dynamicpruning"),
        s"probe scan not partition-pruned:\n$plan")
    } finally {
      built.release()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("pqBuild on an empty corpus probes to an empty top-k, not a div-by-zero") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val empty = emb.filter(col("vec_id") < 0)
    val idx = Ann.pqBuild(empty, "embedding", "vec_id")
    try {
      assert(idx.codebooks.isEmpty && idx.dim == 0)
      assert(idx.codes.count() == 0)
      val probe = Ann.pqProbe(idx, empty,
        emb.filter(col("vec_id") === 0), "embedding", "vec_id", 5)
      assert(probe.count() == 0)
      assert(probe.columns.toSeq == Seq("vec_id", "cos"),
        "empty probe keeps the normal result schema")
    } finally idx.release()
  }

  test("ivfBuild on an empty corpus returns an empty index without training") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val empty = emb.filter(col("vec_id") < 0)
    val idx = Ann.ivfBuild(empty, "embedding")
    assert(idx.centroids.isEmpty)
    assert(idx.assigned.count() == 0)
    val probe = Ann.ivfProbe(idx, emb.filter(col("vec_id") === 0), "embedding", "vec_id", 5)
    assert(probe.count() == 0)
    // the empty index must survive a disk round trip too (zero rows ->
    // no partition dirs, so the writer falls back to schema-only)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_empty").toString
    try {
      Ann.writeIndex(idx, dir)
      val read = Ann.readIndex(spark, dir)
      assert(read.centroids.isEmpty)
      assert(Ann.ivfProbe(read, emb.filter(col("vec_id") === 0),
        "embedding", "vec_id", 5).count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}

class EmbeddingNearDupJoinSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.VectorFunctions._
  import graft.operators.EmbeddingNearDup

  test("cross-corpus cosine join equals the brute-force cross join") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    // new batch: perturbed copies (+0.02 per element) — near their
    // originals at cos >= 0.98, distinct ids
    val fresh = e.select((col("vec_id") + 1000000).as("vec_id"), col("label"),
      transform(col("embedding"), x => x + lit(0.02)).as("embedding"))
    val got = EmbeddingNearDup.cosineJoin(e, fresh, "embedding", "vec_id",
        Seq("label"), minCos = 0.98)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    // brute-force reference: full label-blocked cross join
    val withN = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("nsq", normSq(col("embedding")))
    val brute = withN(e).select(col("label"), col("vec_id").as("l"),
        col("embedding").as("va"), col("nsq").as("na"))
      .join(withN(fresh).select(col("label"), col("vec_id").as("r"),
        col("embedding").as("vb"), col("nsq").as("nb")), "label")
      .withColumn("cos", cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= 0.98)
      .select("l", "r").as[(Long, Long)].collect().toSet
    assert(got == brute, "grid-blocked cross join lost or invented pairs")
    assert(got.nonEmpty)
  }

  test("cosineJoin rejects thresholds where the grid cannot be lossless") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    intercept[IllegalArgumentException] {
      EmbeddingNearDup.cosineJoin(e, e, "embedding", "vec_id", Nil, minCos = 0.25)
    }
  }
}

class ProjGridSpec extends SparkSpec {
  import graft.functions.VectorFunctions._

  test("ε-grid sub-block join equals the plain label join at cos >= 0.98") {
    // same corpus construction as the dedup_embedding_neardup query
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val corpus = e.unionByName(e.select(
      (col("vec_id") + 1000000).as("vec_id"), col("label"),
      transform(col("embedding"), x => x + lit(0.02)).as("embedding")))
    val withN = corpus.withColumn("nsq", normSq(col("embedding")))
    // plain label join — no grid
    val a = withN.select(col("label"), col("vec_id").as("a"),
      col("embedding").as("va"), col("nsq").as("na"))
    val b = withN.select(col("label"), col("vec_id").as("b"),
      col("embedding").as("vb"), col("nsq").as("nb"))
    val plain = a.join(b, Seq("label")).filter(col("a") < col("b"))
      .withColumn("cos", cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= 0.98)
      .select("a", "b").orderBy("a", "b").collect().toSeq
    val grid = graft.queries.VectorOps.dedupEmbeddingNeardup(spark, sf)
      .select("a", "b").orderBy("a", "b").collect().toSeq
    assert(grid == plain, "grid blocking lost pairs vs the plain label join")
  }
}

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private def query = emb.filter(col("vec_id") === 0)
  private def rest = emb.filter(col("vec_id") =!= 0)

  test("IVF-PQ recall >= IVF alone at an equal probed-byte budget") {
    val brute = Ann.bruteForceTopK(rest, query, "embedding", "vec_id", 10)
      .as[(Long, Double)].collect().map(_._1).toSet
    // byte math on this corpus: a code row is 8 ints (32 B) vs a raw
    // vector's 64 floats (256 B) — 8x smaller, so IVF-PQ probing 8 of
    // 16 cells touches the same bytes as IVF probing 1 cell; recall
    // must not be worse for the same budget
    val ivf = Ann.ivfTopK(rest, query, "embedding", "vec_id", 10, nProbe = 1)
      .as[(Long, Double)].collect().map(_._1).toSet
    val idx = Ann.ivfPqBuild(rest, "embedding", "vec_id")
    try {
      val ivfpq = Ann.ivfPqProbe(idx, rest, query, "embedding", "vec_id", 10,
          nProbe = 8, rerankFactor = 4)
        .as[(Long, Double)].collect().map(_._1).toSet
      val rIvf = (brute intersect ivf).size
      val rIvfPq = (brute intersect ivfpq).size
      assert(rIvfPq >= rIvf,
        s"IVF-PQ recall $rIvfPq/10 < IVF $rIvf/10 at equal byte budget")
      assert(rIvfPq > 0, "zero IVF-PQ recall")
    } finally idx.release()
  }

  test("IVF-PQ re-rank cosines are exact; full-probe full-rerank equals brute force") {
    val bruteMap = Ann.bruteForceTopK(rest, query, "embedding", "vec_id", 1000)
      .as[(Long, Double)].collect().toMap
    val idx = Ann.ivfPqBuild(rest, "embedding", "vec_id")
    try {
      val got = Ann.ivfPqProbe(idx, rest, query, "embedding", "vec_id", 10,
          nProbe = 16, rerankFactor = 4)
        .as[(Long, Double)].collect().toSeq
      // whatever the ADC stage proposed, every returned cosine must be
      // the EXACT cosine of that id (the re-rank reads raw vectors)
      got.foreach { case (id, cos) =>
        assert(bruteMap(id) == cos, s"approximate cosine leaked for $id")
      }
      // probing every cell with rerank headroom >= corpus size is
      // brute force by construction
      val all = Ann.ivfPqProbe(idx, rest, query, "embedding", "vec_id", 10,
          nProbe = 16, rerankFactor = rest.count().toInt)
        .as[(Long, Double)].collect().toSeq
      val want = Ann.bruteForceTopK(rest, query, "embedding", "vec_id", 10)
        .as[(Long, Double)].collect().toSeq
      assert(all == want)
    } finally idx.release()
  }

  test("written IVF-PQ index reads back equivalent; probe prunes partitions statically") {
    val built = Ann.ivfPqBuild(rest, "embedding", "vec_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    try {
      Ann.ivfPqWriteIndex(built, dir)
      val read = Ann.ivfPqReadIndex(spark, dir)
      assert(read.dim == built.dim && read.idCol == built.idCol)
      assert(read.centroids.map(_.toSeq).toSeq == built.centroids.map(_.toSeq).toSeq)
      assert(read.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
        built.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
      val fromBuilt = Ann.ivfPqProbe(built, rest, query, "embedding", "vec_id", 10)
        .as[(Long, Double)].collect().toSeq
      val probe = Ann.ivfPqProbe(read, rest, query, "embedding", "vec_id", 10)
      assert(probe.as[(Long, Double)].collect().toSeq == fromBuilt)
      // the literal cell list prunes at LISTING time — static partition
      // filters on the codes scan, no dynamic subquery needed
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") && plan.contains("__cell"),
        s"codes scan not partition-pruned:\n$plan")
    } finally {
      built.release()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ivfPqBuild on an empty corpus probes to an empty top-k") {
    val empty = emb.filter(col("vec_id") < 0)
    val idx = Ann.ivfPqBuild(empty, "embedding", "vec_id")
    try {
      assert(idx.codebooks.isEmpty && idx.centroids.isEmpty && idx.dim == 0)
      val probe = Ann.ivfPqProbe(idx, empty, query, "embedding", "vec_id", 5)
      assert(probe.count() == 0)
      assert(probe.columns.toSeq == Seq("vec_id", "cos"))
    } finally idx.release()
  }
  test("ivfPqInsert: frozen-quantizer add equals same-quantizer rebuild; disk append keeps pruning") {
    val base = emb.filter(col("vec_id") % 2 === 1 && col("vec_id") =!= 0)
    val delta = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") =!= 0)
    val built = Ann.ivfPqBuild(base, "embedding", "vec_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_add").toString
    try {
      val inserted = Ann.ivfPqInsert(built, delta, "embedding")
      val full = base.unionByName(delta)
      val fromInserted = Ann.ivfPqProbe(inserted, full, query, "embedding", "vec_id", 10)
        .as[(Long, Double)].collect().toSeq
      // exact semantics: inserting everything into an empty shell with
      // the SAME trained quantizers is the full-corpus index
      val shell = Ann.IvfPqIndex(inserted.codes.limit(0), built.centroids,
        built.codebooks, built.dim, built.idCol)
      val fromRebuilt = Ann.ivfPqProbe(
        Ann.ivfPqInsert(shell, full, "embedding"), full, query,
        "embedding", "vec_id", 10).as[(Long, Double)].collect().toSeq
      assert(fromInserted == fromRebuilt && fromInserted.nonEmpty)
      // disk twin: write base, append delta, probe equals the in-memory
      // inserted index and the codes scan still prunes statically
      Ann.ivfPqWriteIndex(built, dir)
      Ann.ivfPqAppendIndex(spark, dir, delta, "embedding")
      val read = Ann.ivfPqReadIndex(spark, dir)
      assert(read.codes.count() == full.count())
      val probe = Ann.ivfPqProbe(read, full, query, "embedding", "vec_id", 10)
      assert(probe.as[(Long, Double)].collect().toSeq == fromInserted)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") && plan.contains("__cell"),
        s"appended codes scan not partition-pruned:\n$plan")
    } finally {
      built.release()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
