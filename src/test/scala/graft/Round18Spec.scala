package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Functional + hygiene gates for the r18 wave: the graph family's
  * shortlist → exact-re-rank composition (the last serving-matrix
  * asymmetry), the filtered probe's frontier-side label join, and the
  * cache-hygiene fixes (beamWalk round leaves, weighted-PageRank
  * iteration states) VERDICT r17 called out.
  */
class Round18Spec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect()

  test("rerank serves k exact-cosine-ranked rows per query") {
    val rr = rows("sim_ann_graph_rerank")
    val byQ = rr.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L))
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        "re-ranked cosines must be non-increasing in rank")
    }
  }

  test("rerank recall is never below the serving walk's") {
    val base = rows("sim_ann_graph_recall")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rr = rows("sim_ann_graph_rerank_recall")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rr.keySet == base.keySet)
    // the widened entry+beam shortlist can only add candidates the
    // exact re-rank then orders — per-query hits must not regress
    assert(rr.forall { case (q, h) => h >= base(q) },
      s"rerank lost hits vs the serving walk: rr=$rr base=$base")
    assert(rr.values.sum > base.values.sum ||
      base.values.sum == base.size * 3L,
      "the widened tier should lift recall unless serve is already exact")
  }

  test("a graph probe leaves at most one block-manager entry (the result leaf)") {
    graft.functions.GraftFunctions.register(spark)
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10)
    val t = GraphQueries.graphIndexFor(spark, sfDir)
    // warm the epoch first so its build caches don't count
    GraphOps.probeGraphIndex(spark, t, q, k = 3).collect()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = GraphOps.probeGraphIndex(spark, t, q, k = 3)
    assert(res.collect().nonEmpty)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"a probe must release every round leaf but the result's: $leaked")
  }

  test("weighted PageRank releases its iteration states") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = GraphOps.pageRankWeightedDeltas(spark, sfDir, iters = 3)
    assert(out.collect().length == 3)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"deltas must release the per-iteration rank caches: $leaked")
  }

  test("filtered probe (frontier-side label join) still label-matches exactly") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
    val res = GraphOps.probeGraphIndexFiltered(spark,
      GraphQueries.graphIndexFor(spark, sfDir),
      emb.filter(col("vec_id") < 10), emb, k = 3).collect()
    assert(res.nonEmpty)
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(res.forall(r => labels(r.getLong(0)) == labels(r.getLong(1))),
      "a served neighbor must carry its query's label")
  }
}
