package graft

import org.apache.spark.sql.functions._
import graft.queries.EventAnalytics

/** Independent brute-force references for the event-analytics queries.
  * The DuckDB oracle runs structurally identical SQL, so a shared
  * misreading of the semantics (e.g. non-strict funnel ordering) would
  * pass the hash gate in both engines; these specs recompute the
  * answers imperatively from collected sf0.001 events.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // sf0.001's 15 users all convert and no pair clears min-support; the
  // 150-user tier is the smallest fixture rich enough to witness
  // drop-off and support thresholds (10k events — still a cheap collect)
  override lazy val sf: String = "/root/testdata/sf0.01"

  private lazy val events: Array[(Long, java.sql.Timestamp, String, String)] =
    spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("ts"), col("event_type"), col("props"))
      .as[(Long, java.sql.Timestamp, String, String)].collect()

  test("funnel equals a per-user strict-order replay") {
    val byUser = events.groupBy(_._1)
    def step(prev: Map[Long, Long], evType: String): Map[Long, Long] =
      prev.flatMap { case (u, t) =>
        byUser.getOrElse(u, Array.empty)
          .filter(e => e._3 == evType && e._2.getTime > t)
          .map(_._2.getTime) match {
          case ts if ts.nonEmpty => Some(u -> ts.min)
          case _ => None
        }
      }
    val s1 = byUser.flatMap { case (u, es) =>
      es.filter(_._3 == "view").map(_._2.getTime) match {
        case ts if ts.nonEmpty => Some(u -> ts.min)
        case _ => None
      }
    }.toMap
    val s2 = step(s1, "click")
    val s3 = step(s2, "purchase")
    val expected = Seq(
      ("1_view", s1.size.toLong, s1.keys.sum),
      ("2_click", s2.size.toLong, s2.keys.sum),
      ("3_purchase", s3.size.toLong, s3.keys.sum))
    val got = EventAnalytics.funnelConversion(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == expected)
    // the synthetic stream is dense (every user eventually converts),
    // so step counts may tie; the replay equality above is the content
    // check, and the witness below pins that the ordering hazard exists
    assert(s1.size >= s2.size && s2.size >= s3.size && s3.nonEmpty)
    // strictness witness: some user with both click and view must have
    // their first click AT OR BEFORE their first view (so a non-strict
    // implementation would diverge)
    val nonStrict = s1.keys.exists { u =>
      val clicks = byUser(u).filter(_._3 == "click").map(_._2.getTime)
      clicks.nonEmpty && clicks.min <= s1(u)
    }
    assert(nonStrict, "fixture lacks an out-of-order click witness")
  }

  test("covisitation equals a capped brute-force pair count") {
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val items = events.filter(_._3 == "view").flatMap { e =>
      val k = mapper.readTree(e._4).get("k")
      if (k == null) None else Some((e._1, k.asInt))
    }.distinct.groupBy(_._1)
      .map { case (u, its) => u -> its.map(_._2).sorted.take(16).toList }
    val pairCounts = items.values.toSeq
      .flatMap(its => for { a <- its; b <- its if a < b } yield (a, b))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= 3L)
    val got = EventAnalytics.covisitItemPairs(spark, sf)
      .as[(Int, Int, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(got == pairCounts)
    assert(pairCounts.nonEmpty)
  }
}
