package graft

import org.apache.spark.sql.functions._
import graft.queries.GraphOps

/** Hand-computed references for the integer-mass PageRank core — the
  * declared query's oracle is structurally identical SQL, so these pin
  * the semantics (single-div contributions, teleport base, isolated
  * nodes, floor sub-conservation) against paper arithmetic.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("integer pagerank matches hand-computed masses (incl. dangling-in, isolated)") {
    // triangle 1<->2<->3<->1 plus 4 -> 1 (4 has out-degree but nothing
    // incoming; 5 is fully isolated)
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L),
      (3L, 2L), (4L, 1L)).toDF("src", "dst")
    // round 1: deg(1..3)=2, deg(4)=1; triangle contribs (1e6*85) div 200
    //   = 425000 each; 4 sends (1e6*85) div 100 = 850000 to 1
    //   m1 = (1: 150000+2*425000+850000 = 1850000, 2: 1e6, 3: 1e6,
    //         4: 150000, 5: 150000)
    // round 2: 1 sends (1850000*85) div 200 = 786250 to 2 and 3;
    //   2,3 send 425000 each; 4 sends (150000*85) div 100 = 127500 to 1
    //   m2 = (1: 150000+425000+425000+127500 = 1127500,
    //         2: 150000+786250+425000 = 1361250, 3: 1361250,
    //         4: 150000, 5: 150000)
    val m2 = GraphOps.integerPagerank(nodes, edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(m2 == Map(1L -> 1127500L, 2L -> 1361250L, 3L -> 1361250L,
      4L -> 150000L, 5L -> 150000L))
    // floor sub-conservation: total mass never exceeds n * initial
    assert(m2.values.sum <= 5L * 1000000L)
  }

  test("triangle counts match the brute-force reference (skewed hub, K4, path)") {
    // K4 on 1..4 (4 triangles, each node in 3), a hub 10 connected to
    // leaves 11..15 with one closing edge (11,12) -> exactly 1 triangle
    // at the hub, and a path 20-21-22 with NO triangle
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val hub = (11L to 15L).map(l => (10L, l)) :+ (11L, 12L)
    val path = Seq((20L, 21L), (21L, 22L))
    val edges = (k4 ++ hub ++ path).toDF("u", "v")
    val got = GraphOps.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    // brute force over all node triples
    val es = (k4 ++ hub ++ path).toSet
    def adj(a: Long, b: Long) = es((math.min(a, b), math.max(a, b)))
    val nodesAll = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val ref = (for {
      i <- nodesAll; j <- nodesAll if j > i; k <- nodesAll if k > j
      if adj(i, j) && adj(j, k) && adj(i, k)
    } yield Seq(i, j, k)).flatten
      .groupBy(identity).map { case (n, xs) => (n, xs.size.toLong) }
    assert(got == ref, s"got $got, expected $ref")
    assert(got(1L) == 3L && got(10L) == 1L && !got.contains(20L))
  }

  test("triangle counting is orientation-invariant on a skewed star-of-cliques") {
    // one hub in MANY triangles: hub 0 + 10 spokes, consecutive spokes
    // closed -> deg(hub)=10 >> deg(spokes); the degree orientation must
    // not change counts vs the id order the oracle uses
    val spokes = (1L to 10L).map(s => (0L, s))
    val rim = (1L until 10L).map(s => (s, s + 1))
    val edges = (spokes ++ rim).toDF("u", "v")
    val got = GraphOps.triangleCounts(edges).as[(Long, Long)].collect().toMap
    // hub is in 9 triangles (one per rim edge); spokes 1,10 in 1; rest in 2
    assert(got(0L) == 9L && got(1L) == 1L && got(10L) == 1L &&
      (2L to 9L).forall(got(_) == 2L), s"got $got")
  }

  test("integer pagerank is invariant across disjoint graph copies") {
    val nodes = (Seq(1L, 2L, 3L) ++ Seq(11L, 12L, 13L)).toDF("id")
    def band(off: Long) = Seq((1L + off, 2L + off), (2L + off, 3L + off),
      (3L + off, 1L + off), (1L + off, 3L + off))
    val edges = (band(0L) ++ band(10L)).toDF("src", "dst")
    val m = GraphOps.integerPagerank(nodes, edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert((1L to 3L).forall(i => m(i) == m(i + 10L)),
      s"disjoint copies must rank identically, got $m")
    assert(m.values.toSet.size > 1, "asymmetric degrees must differentiate masses")
  }

  test("bfs distances: frontier expansion equals hand-computed levels") {
    // path 1-2-3-4-5 plus a shortcut 1->4, directed; seed {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = GraphOps.bfsDistances(edges, seeds, maxDepth = 3)
      .as[(Long, Int)].collect().toMap
    // 4 is at dist 1 via the shortcut (NOT 3 via the path); 5 at 2;
    // 3 at 2 via the path; nothing reaches depth 4's frontier
    assert(got == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
  }

  test("bfs distances: maxDepth truncates, multi-seed takes the min") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 4L))
      .toDF("src", "dst")
    val got = GraphOps.bfsDistances(edges, Seq(1L, 10L).toDF("id"),
      maxDepth = 2).as[(Long, Int)].collect().toMap
    // 4 is dist 1 from seed 10 (not 3 from seed 1); 5 follows at 2;
    // the path node at true distance 3 from seed 1 is truncated away
    assert(got == Map(1L -> 0, 10L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
  }

  test("neighbor jaccard matches set arithmetic on a hand membership table") {
    // sets: s1={a,b,c}, s2={a,b}, s3={a,d}
    val m = Seq(("s1", "a"), ("s1", "b"), ("s1", "c"),
      ("s2", "a"), ("s2", "b"), ("s3", "a"), ("s3", "d"))
      .toDF("set_id", "member")
    val got = GraphOps.neighborJaccard(m, minCommon = 1L)
      .as[(String, String, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    // deg: a=3, b=2, c=1, d=1
    assert(got(("a", "b")) == ((2L, 2.0 / 3.0))) // {s1,s2} / {s1,s2,s3}
    assert(got(("a", "c")) == ((1L, 1.0 / 3.0)))
    assert(got(("a", "d")) == ((1L, 1.0 / 3.0)))
    assert(got(("b", "c")) == ((1L, 1.0 / 2.0)))
    assert(!got.contains(("c", "d")), "no shared set -> no pair")
    // minCommon prunes BEFORE the degree joins
    assert(GraphOps.neighborJaccard(m, minCommon = 2L).count() === 1)
  }

  test("pagerank to convergence: fixpoint masses, fixed-depth equality, no leaked blocks") {
    import org.apache.spark.sql.graft.Checkpoints
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L),
      (4L, 1L)).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.keySet

    // capped run, convergence impossible at 2 rounds on this graph:
    // must equal the statically-unrolled variant at the same depth
    val (m2, r2, c2) = GraphOps.integerPagerankConverged(nodes, edges,
      maxRounds = 2)
    val unrolled2 = GraphOps.integerPagerank(nodes, edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(m2.as[(Long, Long)].collect().toMap == unrolled2)
    assert(r2 == 2 && !c2)
    Checkpoints.release(m2)

    // tolerance 0 on this graph can never exit early: integer floors
    // settle into a ±1-unit period-2 jitter (L1 delta 2 forever) — the
    // bounded-rounds termination contract
    val (m0, r0, c0) = GraphOps.integerPagerankConverged(nodes, edges,
      maxRounds = 30, tolerance = 0L)
    assert(r0 == 30 && !c0, s"expected capped non-convergence, got ($r0, $c0)")
    Checkpoints.release(m0)

    // a jitter-sized tolerance converges well before the cap, the
    // result equals the unrolled form at the SAME depth, and one more
    // round moves total mass by at most the tolerance
    val (mf, rf, cf) = GraphOps.integerPagerankConverged(nodes, edges,
      maxRounds = 100, tolerance = 5L)
    assert(cf, s"did not converge in 100 rounds")
    assert(rf < 100)
    val fix = mf.as[(Long, Long)].collect().toMap
    val sameDepth = GraphOps.integerPagerank(nodes, edges, rounds = rf)
      .as[(Long, Long)].collect().toMap
    assert(fix == sameDepth, "converged loop diverged from the unrolled form")
    val oneMore = GraphOps.integerPagerank(nodes, edges, rounds = rf + 1)
      .as[(Long, Long)].collect().toMap
    assert(fix.map { case (k, v) => (v - oneMore(k)).abs }.sum <= 5L,
      "stability window exceeded the declared tolerance")
    Checkpoints.release(mf)

    // checkpoint hygiene: after releasing the returned frames, the
    // loop left nothing pinned (invariants + per-round masses freed)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked blocks: $leaked")
  }

  test("bfs to fixpoint: equals unrolled at the run depth, stops, releases storage") {
    import org.apache.spark.sql.graft.Checkpoints
    // two chains from two seeds + an unreachable island
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 4L),
      (20L, 21L)).toDF("src", "dst")
    val seeds = Seq(1L, 10L).toDF("id")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (visited, rounds) = GraphOps.bfsToFixpoint(edges, seeds)
    val got = visited.as[(Long, Int)].collect().toMap
    // full reachability: island {20,21} absent; everything else leveled
    assert(got == Map(1L -> 0, 10L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
    // fixed-depth equality with the unrolled form at the rounds it ran
    val unrolled = GraphOps.bfsDistances(edges, seeds, maxDepth = rounds)
      .as[(Long, Int)].collect().toMap
    assert(got == unrolled)
    // bounded termination: deepest level is 2, +1 barren proving round
    assert(rounds == 3, s"expected 3 rounds (2 productive + 1 barren), got $rounds")
    Checkpoints.release(visited)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked blocks: $leaked")

    // maxRounds truncates exactly like bfsDistances' maxDepth
    val (capped, ran) = GraphOps.bfsToFixpoint(edges, seeds, maxRounds = 1)
    assert(ran == 1 && capped.as[(Long, Int)].collect().toMap ==
      Map(1L -> 0, 10L -> 0, 2L -> 1, 4L -> 1))
    Checkpoints.release(capped)
  }

  test("k-core peeling: multi-round cascade to the exact core, unrolled equality, no leaks") {
    import org.apache.spark.sql.graft.Checkpoints
    // 5-clique {1..5} (every degree 4) + a cascading tail: 103 starts
    // AT the threshold (deg 3: edges to 102, 3, 4) and only falls
    // below k after 102 (deg 2) peels in round 1 — which is exactly
    // what distinguishes the k-core from a one-shot degree filter
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val edges = (clique ++
      Seq((101L, 102L), (102L, 103L), (3L, 103L), (4L, 103L)))
      .toDF("u", "v")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (core, rounds) = GraphOps.kcoreToFixpoint(edges, k = 3)
    val got = core.as[(Long, Long)].collect().toMap
    // the 3-core is the clique; the returned degrees come from the
    // stable round's recomputation over the core itself, so every
    // member sits at exactly 4 (3's and 4's tail edges died with 103)
    assert(got == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L))
    // rounds: 1 (drop 101,102) + 2 (drop 103, the cascade) + 3 (stable)
    assert(rounds == 3, s"expected 3 rounds, got $rounds")
    // fixed-depth equality with the eager fixed-rounds form (whose
    // blocks self-release after this collect — flush the async bus
    // before asserting)
    val unrolled = GraphOps.kcorePeel(edges, k = 3, rounds = rounds)
      .as[(Long, Long)].collect().toMap
    assert(got == unrolled)
    Checkpoints.release(core)
    org.apache.spark.sql.graft.ListenerBus.flush(spark)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked blocks: $leaked")
  }
}
