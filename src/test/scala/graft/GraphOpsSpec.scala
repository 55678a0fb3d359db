package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Hand-computed gates for the co-purchase graph family: edge
  * enumeration from baskets, degree distribution, PageRank's integer
  * arithmetic on a known graph, and single-count triangle closure. */
class GraphOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def li(rows: (Long, Long)*) =
    rows.toDF("l_orderkey", "l_partkey")

  test("copurchaseEdges: sorted pairs per basket, deduped across baskets, self-free") {
    // order 1: {5,3,9} -> (3,5)(3,9)(5,9); order 2: {3,5,5} -> (3,5); order 3: {7}
    val edges = GraphOps.copurchaseEdges(li(
        (1L, 5L), (1L, 3L), (1L, 9L), (2L, 3L), (2L, 5L), (2L, 5L), (3L, 7L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((3L, 5L), (3L, 9L), (5L, 9L)))
  }

  test("degreeDistribution matches the hand count") {
    // triangle 1-2-3 plus pendant 4 on node 3: degs 2,2,3,1
    val d = GraphOps.degreeDistribution(li(
        (1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap // deg -> n
    assert(d == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("pageRank on the sf0.001 backbone: mass conservation and integer bounds") {
    val ranks = GraphOps.pageRank(spark, "/root/testdata/sf0.001", iters = 3)
    val rows = ranks.collect().map(r => r.getLong(1))
    assert(rows.nonEmpty && rows.forall(_ > 0))
    // damped quantized mass stays within [0.99, 1.0] of SCALE: floor-div
    // only ever loses mass, never creates it
    val total = rows.sum
    assert(total <= 1000000000L && total > 990000000L,
      s"total rank mass $total outside the quantization envelope")
  }

  test("triangles are enumerated exactly once with a<b<c") {
    val tri = GraphOps.triangles(spark, "/root/testdata/sf0.001")
    val rows = tri.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, c) => a < b && b < c })
    assert(rows.distinct.length == rows.length)
  }
}
