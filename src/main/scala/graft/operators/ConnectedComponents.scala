package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster
  * resolution step a production near-dup pipeline runs AFTER pair
  * generation (SURVEY.md §2.9). Pairwise keep-smallest rules (what
  * `dedup_docs_ngram_jaccard`'s survivor filter would do alone) break on
  * chains: with A~B and B~C but A≁C, "drop any doc with a smaller
  * similar doc" drops both B and C even though C's only similar kept
  * document was itself dropped. Real pipelines resolve the similarity
  * graph into components and keep one representative per component.
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
  * and Beyond", SoCC 2014). Both operations are a single groupBy+join on
  * node id (so each round is one co-partitioned shuffle), converge in
  * O(log² n) rounds, and — unlike naive label propagation, which needs
  * diameter-many rounds — stay fast on long chains. High-degree nodes
  * are fine: large-star attaches a star's leaves directly to the
  * minimum, so hot components collapse geometrically instead of
  * funnelling through one reducer repeatedly.
  *
  * Scale notes (100 TB posture):
  *  - Each iteration ends in a checkpoint — iterative DataFrame
  *    algorithms otherwise accumulate lineage and re-execute the entire
  *    history every round. Default is `localCheckpoint` (single-box);
  *    pass `checkpointDir` to use a reliable `checkpoint` to
  *    HDFS/object storage so executor loss cannot force a full
  *    recompute. Either way the prior round's storage (blocks or
  *    rdd-N files) is released as soon as the next round lands.
  *  - Convergence is screened by a two-value signature (edge count +
  *    exact decimal sum of per-edge xxhash64) and then CONFIRMED with
  *    one `exceptAll` emptiness check — a hash collision can cost one
  *    extra comparison join, never a silently wrong answer. Edges are
  *    never collected to the driver on this path.
  *  - Edge growth is bounded: both stars emit at most one edge per
  *    (node, neighbor) and `distinct()` runs inside each round.
  */
object ConnectedComponents {

  /** Resolve components. Input: any DataFrame with two integral node-id
    * columns (an undirected edge per row, self-loops/duplicates
    * tolerated). Output: `(id, component)` for every node that appears
    * in at least one edge, where `component` is the smallest node id
    * reachable from `id` (a stable, deterministic cluster label).
    * Callers wanting singleton rows for isolated nodes left-join this
    * result and coalesce to the node's own id.
    *
    * Edge sets at or below `driverThreshold` distinct edges resolve
    * with an in-driver union-find instead of distributed iteration —
    * the same small-side-fits-in-memory reasoning as a broadcast join,
    * and identical output (min-id labels). A 100 TB corpus whose PAIR
    * GRAPH is small (dedup pair graphs usually are: pairs ≪ corpus)
    * never pays star-contraction's per-round job overhead; graphs
    * bigger than the threshold take the distributed path.
    */
  def resolve(edges: DataFrame, src: String, dst: String, maxIter: Int = 50,
      driverThreshold: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // session-global state: remember and restore, so this operator's
    // checkpoint dir never silently becomes the default for unrelated
    // later rdd.checkpoint() users (who may delete OUR dir, or we
    // theirs)
    val prevCkptDir = org.apache.spark.sql.graft.Checkpoints.checkpointDirOf(sc)
    checkpointDir.foreach(sc.setCheckpointDir)
    def snap(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) {
        // persist BEFORE a reliable checkpoint: the eager count job and
        // the checkpoint-write job are separate jobs, and without a
        // cache the round's whole star-contraction stage runs twice
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = df.checkpoint(eager = true)
        df.unpersist(blocking = false)
        out
      } else df.localCheckpoint()
    def restoreDir(): Unit =
      if (checkpointDir.isDefined)
        org.apache.spark.sql.graft.Checkpoints.restoreCheckpointDir(sc, prevCkptDir)
    // body as a named def so every exit path (early returns, throws)
    // funnels through ONE finally that restores the session state
    def body(): DataFrame = {
    var e = snap(edges
      .select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .where(col("src") =!= col("dst") && col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    val nEdges = e.count()
    if (nEdges == 0) {
      org.apache.spark.sql.graft.Checkpoints.release(e)
      return edges.sparkSession.range(0)
        .select(col("id").cast("long").as("id"), col("id").cast("long").as("component"))
    }
    if (nEdges <= driverThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val pairs = e.as[(Long, Long)].collect()
      org.apache.spark.sql.graft.Checkpoints.release(e)
      return unionFind(pairs).toSeq.toDF("id", "component")
    }
    var sig = signature(e)
    var it = 0
    var converged = false
    // a mid-round failure (disk-full during a shuffle, executor OOM,
    // the maxIter require) must not leave the current round's
    // checkpoint pinned for the session lifetime
    try {
      while (!converged && it < maxIter) {
        val next = snap(smallStar(largeStar(e)))
        val nextSig = signature(next)
        // signature equality is only a screen; confirm the fixpoint
        // exactly (both sets are distinct and counts match via the
        // signature, so an empty next∖e IS set equality — one extra
        // join, paid only on apparent convergence). A hash collision
        // therefore cannot end the loop on a wrong edge set.
        converged = nextSig == sig && next.exceptAll(e).isEmpty
        sig = nextSig
        val prev = e
        e = next
        // Dataset.unpersist is a silent no-op on checkpoint blocks — the
        // dedicated shim frees the truncated round's storage for real.
        org.apache.spark.sql.graft.Checkpoints.release(prev)
        it += 1
      }
      require(converged, s"connected components did not converge in $maxIter rounds")
    } catch {
      case t: Throwable =>
        org.apache.spark.sql.graft.Checkpoints.release(e)
        throw t
    }
    // Fixpoint edges form stars (node -> component minimum); orient and
    // add the roots themselves. The assignment is materialized into its
    // own (smaller) checkpoint so the converged edge blocks can be freed
    // here; the returned frame is the ONE pinned artifact, and it is the
    // caller's to release (`Checkpoints.release`) once consumed — it is
    // the dedup map, typically read several times downstream.
    val canon = e.select(
      greatest(col("src"), col("dst")).as("id"),
      least(col("src"), col("dst")).as("component"))
    val assignment = snap(canon
      .union(canon.select(col("component").as("id"), col("component")))
      .distinct())
    org.apache.spark.sql.graft.Checkpoints.release(e)
    assignment
    }
    try body() finally restoreDir()
  }

  /** Survivor filter: one representative (minimum id) per component.
    * `nodes` must expose `idCol`; nodes absent from `edges` are
    * singletons and survive.
    */
  def dedupByComponent(nodes: DataFrame, edges: DataFrame, idCol: String,
      src: String, dst: String, driverThreshold: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    val comp = resolve(edges, src, dst, driverThreshold = driverThreshold,
      checkpointDir = checkpointDir)
    val out = nodes
      .join(comp, nodes(idCol) === comp("id"), "left")
      .where(col("component").isNull || col("component") === nodes(idCol))
      .select(nodes.columns.map(nodes(_)).toIndexedSeq: _*)
    // the assignment handle is internal here (callers never see comp),
    // so it must self-release after the consuming action or every
    // invocation would pin its blocks for the session lifetime. Same
    // one-materializing-action contract as the declared query.
    CacheLifecycle.releaseAfterAction(out, Seq(comp))
  }

  /** large-star: for each node u (over the symmetrized edge set), link
    * every strictly larger neighbor to m = min(N(u) ∪ {u}).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy(col("src").as("u"))
      .agg(min(col("dst")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, sym("src") === mins("u"))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** small-star: orient edges toward smaller ids; for each node u link
    * all smaller neighbors (and u itself) to m = min of them.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .distinct()
    val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
    dir.join(mins, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .union(mins.select(col("u").as("src"), col("m").as("dst")))
      .distinct()
  }

  /** In-driver union-find with path compression and min-id roots —
    * exactly the distributed fixpoint's semantics on small graphs.
    */
  private def unionFind(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
      parent.getOrElseUpdate(r, r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // snapshot keys before the final resolution pass: find() path-compresses
    // (mutates the map), and mutating a LongMap mid-keysIterator is UB
    val ks = parent.keys.toArray
    ks.iterator.map(k => k -> find(k)).toMap
  }

  /** Order-independent edge-set signature: (count, exact decimal sum of
    * xxhash64(src, dst)). Decimal accumulation avoids long-sum overflow
    * under ANSI semantics. The signature is a SCREEN only — apparent
    * convergence is confirmed exactly with `exceptAll` in the loop, so
    * a collision costs one wasted comparison join, never correctness.
    */
  private def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
    val r = e.agg(
      count(lit(1)).as("n"),
      sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")).as("h")).head()
    (r.getLong(0), r.getDecimal(1))
  }
}
