package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventOps

/** funnelReach's scale claim as a regression gate: the cascade shuffles
  * each stage's FILTERED event slice once on the user key, and the
  * reached side re-uses the stage-1 groupBy partitioning through every
  * join and re-aggregation — no extra exchange per stage, no shuffle of
  * the full log. (HashPartitioning(user) satisfies the later
  * groupBy(user, t1..ti) clustering because user is a subset of the
  * keys.) */
class FunnelPlanSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = {
    def nodes(x: SparkPlan): Seq[SparkPlan] = x +: x.children.flatMap(nodes)
    nodes(p).collect { case e: ShuffleExchangeExec => e }
  }

  test("one shuffle per stage, none for the reached side") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (nStages <- 2 to 3) {
        val stages = Seq("signup", "click", "purchase").take(nStages)
        val plan = EventOps.funnelReach(
          Tables.events(spark, "/root/testdata/sf0.001"),
          "user_id", "event_type", "ts_us", stages)
          .queryExecution.executedPlan
        val ex = shuffles(plan)
        assert(ex.length == nStages,
          s"$nStages-stage funnel must shuffle exactly $nStages filtered " +
            s"slices, found ${ex.length}:\n$plan")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }
}
