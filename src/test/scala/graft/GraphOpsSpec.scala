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
}
