package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.IntersectCountSorted

/** The two-pointer merge count must equal size(array_intersect) on
  * sorted-distinct inputs — checked on edges and random sets. */
class IntersectCountSortedSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def check(pairs: Seq[(Seq[Long], Seq[Long])]): Unit = {
    IntersectCountSorted.register(spark)
    val df = pairs.map { case (a, b) => (a.distinct.sorted, b.distinct.sorted) }
      .toDF("a", "b")
    val out = df.select(
      IntersectCountSorted(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"fast=${r.getLong(0)} builtin=${r.getLong(1)}"))
  }

  test("edges: empty, disjoint, identical, subset") {
    check(Seq(
      (Nil, Nil),
      (Seq(1L, 2L, 3L), Nil),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L, 3L, 4L, 5L), Seq(2L, 4L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue))))
  }

  test("random sets match the builtin") {
    val g = Gen.listOfN(2, Gen.listOfN(40, Gen.chooseNum(0L, 60L)))
    val cases = (0 until 20).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
      .map { case Seq(a, b) => (a: Seq[Long], b: Seq[Long]) }
    check(cases)
  }
}
