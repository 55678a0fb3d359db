package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps

/** Semantics of [[VectorOps.semanticDedup]] — cluster-partitioned
  * embedding dedup with keep-lowest survivor selection. */
class SemanticDedupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("near-identical vectors in one semantic cluster keep the lowest id") {
    graft.functions.GraftFunctions.register(spark)
    // two well-separated directions (clusters); 1/2/3 are tiny
    // perturbations of one direction (near-dups), 10/11 of the other but
    // distinct enough to stay below the threshold
    def v(base: Float, eps: Float) =
      Array.tabulate(8)(d => if (d < 4) base + (if (d == 0) eps else 0f) else 0.01f)
    def w(base: Float, eps: Float) =
      Array.tabulate(8)(d => if (d >= 4) base + (if (d == 7) eps else 0f) else 0.01f)
    val corpus = Seq(
      (1L, v(1.0f, 0.000f)), (2L, v(1.0f, 0.001f)), (3L, v(1.0f, 0.002f)),
      (10L, w(1.0f, 0.0f)), (11L, w(1.0f, 1.5f))).toDF("vec_id", "embedding")
    val kept = VectorOps.semanticDedup(corpus, numCentroids = 2,
        trainIters = 2, threshold = 0.9999)
      .select("vec_id").as[Long].collect().toSet
    // 2 and 3 are near-dups of 1 (kept: lowest id); 11 differs enough
    // from 10 to survive the 0.9999 cut
    assert(kept == Set(1L, 10L, 11L), s"got $kept")
  }

  test("with no pairs above threshold every vector survives") {
    graft.functions.GraftFunctions.register(spark)
    val corpus = (0 until 6).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat))
    }.toDF("vec_id", "embedding")
    val kept = VectorOps.semanticDedup(corpus, numCentroids = 2,
        trainIters = 1, threshold = 0.9999)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == (0L until 6L).toSet)
  }
}
