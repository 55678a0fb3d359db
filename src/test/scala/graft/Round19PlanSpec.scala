package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions for the r19 analytics wave: the properties
  * that make these operators survive 100 TB are pinned here, not just
  * asserted in comments (the Round15PlanSpec discipline). */
class Round19PlanSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def planStr(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("events_dau_wau_mau: the trailing-window join broadcasts the day grid") {
    val p = planStr("events_dau_wau_mau")
    assert(!p.contains("CartesianProduct"),
      "the range join must ride the broadcast day grid, never a cross")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the calendar-bounded grid is the broadcast side of the range join")
  }

  test("graph_edge_embeddedness: the wedge join is equi-keyed, no cartesian") {
    val p = planStr("graph_edge_embeddedness")
    assert(!p.contains("CartesianProduct"),
      "common neighbors come from equi-joins on the shared endpoint")
  }

  test("stats_bootstrap_ci: replicates explode in-scan, totals broadcast back") {
    val p = planStr("stats_bootstrap_ci")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate explode"),
      "the 64 replicate weights are a per-row explode, not a join fan-out")
  }

  test("pipeline_domain_distance: the bucket grid joins hash-keyed, no cartesian") {
    val p = planStr("pipeline_domain_distance")
    assert(!p.contains("CartesianProduct"),
      "the lang-pair term fold must join on the bucket key")
  }

  test("stats_chi2_independence: both marginals reach the cell grid as broadcasts") {
    val p = planStr("stats_chi2_independence")
    val bc = p.linesIterator.count(_.contains("BroadcastExchange"))
    assert(bc >= 2,
      s"row and column totals must broadcast onto the types×7 grid, saw $bc")
  }

  test("graph_hits: every half-iteration total reaches the scores as a broadcast") {
    val p = planStr("graph_hits")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "the 1-row L1 total must broadcast, never shuffle")
  }
}
