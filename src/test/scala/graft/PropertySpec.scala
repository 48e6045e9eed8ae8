package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based algebraic invariants (SURVEY.md §5.3): generated data
  * through the real engine, compared against straight-line Scala
  * reference computations. Raw ScalaCheck generators with fixed seeds
  * (the scalatest bridge artifact isn't in the offline cache) — each
  * property runs over 20 deterministic samples.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int = 20): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rows: Gen[List[(Int, Int)]] = Gen.listOfN(60,
    Gen.zip(Gen.choose(0, 5), Gen.choose(-1000, 1000)))

  test("groupBy-sum equals naive per-key sum") {
    samples(rows).foreach { data =>
      val got = data.toDF("k", "v").groupBy("k").agg(sum("v").as("s"))
        .as[(Int, Long)].collect().toMap
      val expected = data.groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2.toLong).sum
      }
      assert(got == expected)
    }
  }

  test("union-distinct is idempotent") {
    samples(rows, 10).foreach { data =>
      val df = data.toDF("k", "v")
      val once = df.union(df).distinct()
      val twice = once.union(once).distinct()
      assert(once.collect().toSet == twice.collect().toSet)
      assert(once.count() == data.distinct.size)
    }
  }

  test("window cumulative sum ends at the group total") {
    samples(rows, 10).filter(_.nonEmpty).foreach { data =>
      val df = data.zipWithIndex.map { case ((k, v), i) => (k, v, i) }
        .toDF("k", "v", "ord")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("ord")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val lastCum = df.withColumn("cum", sum("v").over(w))
        .groupBy("k").agg(max_by(col("cum"), col("ord")).as("final"))
        .as[(Int, Long)].collect().toMap
      val groupSum = df.groupBy("k").agg(sum("v")).as[(Int, Long)].collect().toMap
      assert(lastCum == groupSum)
    }
  }

  test("dropDuplicates leaves no duplicate keys and loses no key") {
    samples(rows, 10).foreach { data =>
      val ks = data.toDF("k", "v").dropDuplicates("k")
        .select("k").as[Int].collect()
      assert(ks.length == ks.distinct.length)
      assert(ks.toSet == data.map(_._1).toSet)
    }
  }

  test("sort is an ordered permutation of its input") {
    samples(rows, 10).foreach { data =>
      val sorted = data.toDF("k", "v").orderBy("k", "v")
        .as[(Int, Int)].collect().toSeq
      assert(sorted.sorted == data.sorted)
      assert(sorted == sorted.sortBy(identity))
    }
  }

  test("inner join equals reference nested-loop join") {
    val dims = Gen.listOfN(6, Gen.zip(Gen.choose(0, 5), Gen.alphaStr.map(_.take(4))))
    samples(Gen.zip(rows, dims), 10).foreach { case (fact, dim) =>
      val dimDedup = dim.distinctBy(_._1)
      val got = fact.toDF("k", "v")
        .join(dimDedup.toDF("k", "name"), Seq("k"))
        .as[(Int, Int, String)].collect().toSeq.sorted
      val dimMap = dimDedup.toMap
      val expected = fact.flatMap { case (k, v) =>
        dimMap.get(k).map(n => (k, v, n))
      }.sorted
      assert(got == expected)
    }
  }
}
