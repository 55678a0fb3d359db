package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.operators.SearchOps

/** Plan-shape regression for the BM25 norms join (VERDICT r11 watch #1):
  * the doc-length sidecar is bucketed on `doc_id`, so the probe's norms
  * join must never shuffle the SIDECAR side — only the batch-sized
  * candidate set exchanges to meet it. At 100 TB the sidecar is
  * corpus-sized; an exchange over it would be the probe's dominant
  * cost. */
class Bm25PlanSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("searchBm25: no exchange above the doclens scan; append keeps the bucket spec") {
    val table = "graft_bm25_plan_spec_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val path = java.nio.file.Files
      .createTempDirectory("graft_bm25_plan_spec_").toString
    val dlPath = java.nio.file.Files
      .createTempDirectory("graft_bm25_plan_spec_dl_").toString
    val docs = (1L to 40L).map(i =>
      (i, s"spark window doc$i filler tokens here"))
      .toDF("doc_id", "text")
    try {
      SearchOps.writeSearchIndex(docs.filter(col("doc_id") <= 30),
        "doc_id", "text", table, path, numBuckets = 4)
      SearchOps.writeDocLengths(spark, table, dlPath, numBuckets = 4)
      // maintenance must not degrade the layout: the appended sidecar
      // rows land as one more correctly-bucketed file group
      SearchOps.appendToSearchIndex(spark, table,
        docs.filter(col("doc_id") > 30), "doc_id", "text", numBuckets = 4)
      SearchOps.appendDocLengths(spark, table,
        docs.filter(col("doc_id") > 30), "doc_id", "text", numBuckets = 4)

      // kill broadcast + AQE so the norms join is forced to plan as a
      // genuine shuffled join — the scale shape; the probe session
      // mirrors these from the caller's conf
      val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val res = SearchOps.searchBm25(spark, table, Seq("spark", "window"), 10)
        // correctness first: every doc matches both terms, top-10 served
        assert(res.collect().length == 10)
        def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)
        val all = nodes(res.queryExecution.executedPlan)
        def isDoclensScan(p: SparkPlan): Boolean = p match {
          case f: FileSourceScanExec =>
            f.relation.bucketSpec.exists(_.bucketColumnNames == Seq("doc_id"))
          case _ => false
        }
        assert(all.exists(isDoclensScan),
          "no bucketed doclens scan in the BM25 plan — sidecar lost its bucket spec")
        // two sidecar consumers exist: the corpus-stats fold (a partial
        // aggregate whose exchange moves ONE row per task — allowed) and
        // the norms join. Forbidden is a HASH repartition of sidecar
        // rows, which is what the join would need were the bucket spec
        // lost.
        all.collect { case s: ShuffleExchangeExec => s }
          .filter(s => nodes(s).exists(isDoclensScan)).foreach { s =>
            assert(s.outputPartitioning.isInstanceOf[
                org.apache.spark.sql.catalyst.plans.physical.SinglePartition.type],
              s"the norms sidecar is hash-reshuffled at probe time:\n$s")
          }
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${table}_doclens")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
