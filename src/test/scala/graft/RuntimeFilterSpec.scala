package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** At 100 TB the biggest join win after broadcast is Spark's runtime
  * bloom filter: a selective predicate on one join side materializes a
  * bloom filter that prunes the OTHER side's scan before the shuffle.
  * Local toy thresholds never trigger it, so this spec lowers them and
  * pins that the engine's plans are runtime-filter-eligible — a shape
  * regression here (e.g. a projection hiding the join key, or a
  * non-deterministic expression above the scan) would silently cost a
  * full fact-table shuffle at scale. */
class RuntimeFilterSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("selective dim predicate injects a bloom filter into the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.001"
      val li = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val plan = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).count()
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter in the optimized plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
