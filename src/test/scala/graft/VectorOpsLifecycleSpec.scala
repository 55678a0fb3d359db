package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps

/** VERDICT r8 #6 (the ADVICE r6 CacheManager leak class): repeated
  * [[VectorOps.ivfTopK]] invocations in one session must not accumulate
  * pinned centroid blocks. The centroid set is materialized via an
  * RDD-level persist, which is reference-tracked: once a caller drops its
  * result plan, the ContextCleaner frees the blocks on GC — a `cache()`
  * would instead leak one CacheManager entry per call forever (its
  * `cachedData` holds plans strongly), and a `localCheckpoint` would
  * discard lineage (ADVICE r7 #2).
  *
  * Measured nuance this test is shaped around: Spark's driver machinery
  * keeps a transient strong reference to the most recent query's RDDs
  * until later activity displaces it, so "released immediately after GC"
  * is not testable — but "the tail stays at ≤1 across invocations" is
  * deterministic (each invocation's blocks are collected by the time the
  * next one settles), and the leak class would show i entries after i
  * invocations. */
class VectorOpsLifecycleSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 64 deterministic vectors of dim 8; ids 0..63 (trainCentroids seeds
  // from vec_id < numCentroids)
  private def corpus: DataFrame =
    (0L until 64L).map { i =>
      (i, Array.tabulate(8)(d => (((i * 7 + d * 3) % 13) + 1).toFloat))
    }.toDF("vec_id", "embedding")

  // one invocation isolated in its own frame: once it returns, nothing
  // reachable references the result plan, so GC can collect its blocks
  // (references held in the SAME frame — even dead locals — prevent that)
  private def invokeAndMeasure(queries: DataFrame, i: Int,
      before: scala.collection.Set[Int]): Int = {
    val result = VectorOps.ivfTopK(queries, corpus, k = 3,
      numCentroids = 4, nProbe = 2, trainIters = 1)
    assert(result.count() > 0, s"invocation $i returned no neighbors")
    (spark.sparkContext.getPersistentRDDs.keySet -- before).size
  }

  test("repeated ivfTopK calls don't accumulate persisted centroid blocks") {
    graft.functions.GraftFunctions.register(spark)
    val sc = spark.sparkContext
    val queries = corpus.filter($"vec_id" < 3)
    val before = sc.getPersistentRDDs.keySet
    for (i <- 1 to 3) {
      val live = invokeAndMeasure(queries, i, before)
      // while the result is alive exactly one centroid RDD may be pinned
      // per in-flight invocation; stale ones from prior iterations must
      // already be collectable — poll GC down to the ≤1 steady state
      assert(live <= i, s"invocation $i: $live pinned RDD sets while live")
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var tail = live
      while (tail > 1 && System.nanoTime() < deadline) {
        System.gc()
        Thread.sleep(200)
        tail = (sc.getPersistentRDDs.keySet -- before).size
      }
      assert(tail <= 1,
        s"invocation $i left $tail pinned centroid block sets — the " +
          "CacheManager-style accumulation the RDD-level persist exists to avoid")
    }
  }
}
