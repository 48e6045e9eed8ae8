package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** large-star/small-star component resolution vs a driver-side
  * union-find oracle, plus the chain case that breaks pairwise
  * keep-smallest dedup rules.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** threshold 0 forces the distributed star-contraction path; the
    * default exercises the driver union-find fast path. Every
    * behavioral test below runs BOTH and asserts they agree.
    */
  private def resolveMap(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    val dist = ConnectedComponents.resolve(df, "a", "b", driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    val drv = ConnectedComponents.resolve(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(dist == drv, "driver fast path must equal distributed result")
    dist
  }

  /** Driver-side union-find (path compression, min-id roots). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("long chain collapses to one component (the case pairwise rules break)") {
    val chain = (0L until 19L).map(i => (i, i + 1))
    val got = resolveMap(chain)
    assert(got.size == 20 && got.values.forall(_ == 0L))
  }

  test("two cliques stay separate until bridged") {
    val cliqueA = for (i <- 0 to 3; j <- i + 1 to 3) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 to 13; j <- i + 1 to 13) yield (i.toLong, j.toLong)
    val separate = resolveMap(cliqueA ++ cliqueB)
    assert((0L to 3L).forall(separate(_) == 0L) && (10L to 13L).forall(separate(_) == 10L))
    val bridged = resolveMap(cliqueA ++ cliqueB :+ (3L, 10L))
    assert(bridged.values.forall(_ == 0L))
  }

  test("matches union-find on a seeded random graph (incl. dups and self-loops)") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(150)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    val expected = unionFind(edges.filter(e => e._1 != e._2))
    assert(resolveMap(edges) == expected)
  }

  test("high-degree star with non-minimal hub resolves to global min") {
    // hub 500 connected to 0..99: component must be 0, not the hub
    val star = (0L until 100L).map(i => (500L, i))
    val got = resolveMap(star)
    assert(got.size == 101 && got.values.forall(_ == 0L))
  }

  test("dedupByComponent keeps one representative per component plus singletons") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val kept = ConnectedComponents
      .dedupByComponent(nodes, edges, "id", "a", "b")
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L, 7L))
  }

  test("resolve pins exactly one artifact (the assignment); release frees it") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val comp = ConnectedComponents.resolve(edges, "a", "b", driverThreshold = 0L)
    assert(comp.count() == 5)
    // every intermediate round's checkpoint must already be freed —
    // Dataset.unpersist is a no-op on checkpoint blocks, so this guards
    // the dedicated release shim actually running per round
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinned.size == 1, s"expected only the assignment checkpoint, got $pinned")
    org.apache.spark.sql.graft.Checkpoints.release(comp)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("dedupByComponent self-releases its internal assignment checkpoint") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    // distributed path so a real checkpoint exists to leak
    val kept = ConnectedComponents
      .dedupByComponent(nodes, edges, "id", "a", "b", driverThreshold = 0L)
    assert(kept.count() == 2)
    org.apache.spark.sql.graft.ListenerBus.flush(spark)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked assignment blocks: $leaked")
  }

  test("empty edge set yields empty assignment") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.resolve(empty, "a", "b").isEmpty)
  }

  test("reliable checkpointDir: identical labels, per-round files released") {
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    try {
      val rnd = new scala.util.Random(7)
      val edges = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .toDF("a", "b")
      val rel = ConnectedComponents.resolve(edges, "a", "b",
        driverThreshold = 0L, checkpointDir = Some(dir))
      val got = rel.as[(Long, Long)].collect().toMap
      val want = ConnectedComponents.resolve(edges, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got == want, "reliable-checkpoint path must not change labels")
      // every intermediate round's rdd-N directory must already be
      // deleted; only the returned assignment's files may remain
      def rddDirs = {
        val base = new java.io.File(dir)
        Option(base.listFiles()).toSeq.flatten // the UUID session dirs
          .flatMap(u => Option(u.listFiles()).toSeq.flatten)
          .filter(_.getName.startsWith("rdd-"))
      }
      assert(rddDirs.size == 1,
        s"expected only the assignment checkpoint on disk, got ${rddDirs.map(_.getName)}")
      org.apache.spark.sql.graft.Checkpoints.release(rel)
      assert(rddDirs.isEmpty, "release must delete the assignment's checkpoint files")
      // resolve() must restore the session's previous checkpoint dir
      // (None here) — its dir must never become the session default
      assert(org.apache.spark.sql.graft.Checkpoints
        .checkpointDirOf(spark.sparkContext).isEmpty,
        "resolve leaked its checkpoint dir into the session")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
