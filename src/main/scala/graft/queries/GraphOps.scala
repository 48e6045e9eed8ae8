package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Graph analytics over a co-occurrence graph derived from the fixture
  * star schema (SURVEY.md §2.9 extension, round 11). Connected
  * components ([[graft.operators.ConnectedComponents]]) covered the
  * iterative-CLOSURE shape; this adds the iterative-NUMERIC shape —
  * PageRank-style mass propagation — expressed so every round is one
  * co-partitioned equi-join + aggregate, and the arithmetic is exact
  * integers so a fixed-iteration run is DuckDB-hash-checkable (real
  * PageRank's damped double divisions accumulate in engine- and
  * partition-order-dependent ways; the scaled-integer-mass variant is
  * the same propagation structure with deterministic floors).
  */
object GraphOps {

  /** Integer-mass PageRank (3 synchronous rounds, damping 0.85) over
    * the parts-bought-together graph: nodes are parts, with a directed
    * edge each way between parts co-occurring in an order.
    *
    * Mass protocol: every node starts with 10^6 integer mass; each
    * round a node sends each out-neighbor `(mass·85) div (100·deg)` —
    * ONE integer division per edge (dividing twice, damp then spread,
    * would floor twice and lose more mass; both engines compute the
    * single `div` identically on positive operands) — and every node
    * restarts from the 150 000 teleport base plus what it received.
    * Floor loss makes total mass slightly sub-conserved; that is the
    * deterministic contract, not a defect.
    *
    * Scale shape: the edge build is the bounded-clique trick (orders
    * hold ≤ 7 parts, so per-order pair expansion is a constant ≤ 42;
    * the co-visitation query handles the unbounded-group variant with
    * an explicit cap); each round shuffles edges by src to meet the
    * mass table (co-partitioned with the previous round's aggregate
    * output) and aggregates contributions by dst — the plan a Pregel
    * superstep compiles to. Three rounds statically unrolled: at 100 TB
    * each round is one shuffle of the edge table, and the mass table
    * (one row per node) rides the same hash partitioning throughout.
    */
  /** The reusable operator core: `rounds` synchronous integer-mass
    * supersteps over (`nodes`: col `id`; `edges`: cols `src`, `dst`).
    * Returns (id, mass). See [[graphPagerank]] for the mass protocol.
    *
    * The edge list and degree table are loop INVARIANTS re-read by
    * every superstep. Persisting them was measured SLOWER at bench
    * scale (4.73 s vs 3.12 s lazy, sf0.1 single-query): the statically
    * unrolled rounds expose identical edge/deg subtrees to Catalyst,
    * ReuseExchange shares their shuffles within the one action, and
    * the cache's materialize-write of 2M edge rows costs more than the
    * residual recompute it avoids. On a real cluster with MANY
    * iterations (or a convergence loop, where each round is its own
    * action and nothing can be reused across them), checkpoint the
    * edge frame exactly as ConnectedComponents does.
    */
  def integerPagerank(nodes: DataFrame, edges: DataFrame,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var mass = nodes.select(col("id"), lit(1000000L).as("mass"))
    for (_ <- 1 to rounds) {
      val contrib = edges
        .join(mass.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"),
          expr("(mass * 85) div (100 * deg)").as("c"))
        .groupBy("id").agg(sum("c").as("recv"))
      mass = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + coalesce(col("recv"), lit(0L))).as("mass"))
    }
    mass
  }

  def graphPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val po = Tables(spark, sfDir).lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = po.select(col("ok"), col("pk").as("src"))
      .join(po.select(col("ok"), col("pk").as("dst")), "ok")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val nodes = Tables(spark, sfDir).part
      .select(col("p_partkey").as("id"))
    integerPagerank(nodes, edges, rounds = 3)
      .orderBy(col("mass").desc, col("id")).limit(20)
      .select(col("id").as("p_partkey"), col("mass"))
  }

  val graphPagerankSql: String = {
    def round(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT n.id, 150000 + COALESCE(s.recv, 0) AS mass
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, sum((m.mass * 85) // (100 * d.deg)) AS recv
         |    FROM edges e
         |    JOIN $prev m ON e.src = m.id
         |    JOIN deg d ON e.src = d.src
         |    GROUP BY 1) s ON n.id = s.id)""".stripMargin
    s"""WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |edges AS (
       |  SELECT DISTINCT a.pk AS src, b.pk AS dst
       |  FROM po a JOIN po b ON a.ok = b.ok AND a.pk <> b.pk),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |nodes AS (SELECT p_partkey AS id FROM part),
       |m0 AS (SELECT id, 1000000 AS mass FROM nodes),
       |${round("m0", "m1")},
       |${round("m1", "m2")},
       |${round("m2", "m3")}
       |SELECT id AS p_partkey, CAST(mass AS BIGINT) AS mass
       |FROM m3 ORDER BY mass DESC, id LIMIT 20""".stripMargin
  }
}
