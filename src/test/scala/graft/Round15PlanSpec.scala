package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions for the r15 late wave: the properties that
  * make these operators survive 100 TB are pinned here, not just
  * asserted in comments. Assertions read the executed-plan string so
  * they see through the AdaptiveSparkPlan wrapper.
  */
class Round15PlanSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def planStr(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("join_band_eps: value-domain band join plans no cartesian product") {
    val p = planStr("join_band_eps")
    assert(!p.contains("CartesianProduct"),
      "band join must stay an equi-join on (type, bucket), never a cross")
  }

  test("cdc_scd2_build: exactly one window pass derives the intervals") {
    val p = planStr("cdc_scd2_build")
    val windows = p.linesIterator.count(_.trim.startsWith("+- Window"))
    assert(windows == 1,
      s"SCD2 is one lead() window over the log, found $windows in:\n$p")
  }

  test("cdc_drain_keyset: the cursor applies broadcast, pages never sort-merge") {
    val p = planStr("cdc_drain_keyset")
    assert(!p.contains("SortMergeJoin"),
      "cursor application must not sort-merge the queue")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "the singleton cursor must reach the queue as a broadcast")
  }

  test("sim_ann_lsh_multiprobe: probe fan-out stays on the broadcast side") {
    graft.functions.GraftFunctions.register(spark)
    val p = planStr("sim_ann_lsh_multiprobe")
    assert(p.contains("BroadcastHashJoin"),
      "the exploded query-probe side must broadcast; the corpus is streamed")
  }
}
