package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the co-located bucketed join's plan
  * ([[RelationalQueries.bucketedTpchFor]] + `join_bucketed_colocated`):
  * both facts are bucketBy(16, orderkey), so the sort-merge join must
  * consume the bucket layout directly — NO ShuffleExchange between
  * either scan and the join. The one-time bucketed write paid the
  * orderkey shuffle that every future lineitem⋈orders query would
  * otherwise repeat; at 100 TB that per-query shuffle is the dominant
  * cost, which is the whole point of the technique. */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)

  test("bucketed fact-fact join runs with zero exchange below the join") {
    val (liT, ordT) = RelationalQueries.bucketedTpchFor(spark, dir)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table(liT).hint("merge")
        .join(spark.table(ordT), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderpriority"))
      val plan = joined.queryExecution.executedPlan
      val all = nodes(plan)
      val smj = all.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"no sort-merge join in the plan:\n$plan")
      // no exchange anywhere below the join: the bucket layout IS the
      // required distribution on both sides
      smj.foreach { j =>
        assert(!nodes(j).exists(_.isInstanceOf[ShuffleExchangeExec]),
          s"exchange below the bucketed join:\n$j")
      }
      // and the join really joins: row count matches the plain join
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
