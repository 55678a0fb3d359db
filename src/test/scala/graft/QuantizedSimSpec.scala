package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps

/** Contracts of the int8 quantization path: scale anchoring, exactness of
  * the integer scoring, and agreement with the exact ranking on
  * well-separated vectors. */
class QuantizedSimSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("quantizeInt8 anchors max-|x| to ±127; zero vector stays zero") {
    val out = vecs(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0f, 0f, 0f)))
      .select(col("vec_id"), VectorOps.quantizeInt8(col("embedding")).as("q"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L) == Seq(64, -127, 32), "0.5→63.5 rounds half-up to 64")
    assert(out(2L) == Seq(0, 0, 0))
  }

  test("cosineQ is exactly 1 for identical vectors") {
    graft.functions.GraftFunctions.register(spark)
    val one = vecs((1L, Seq(0.3f, 0.4f, -0.9f)))
      .select(VectorOps.cosineQ(
        VectorOps.quantizeInt8(col("embedding")),
        VectorOps.quantizeInt8(col("embedding"))))
      .as[Double].collect().head
    assert(one == 1.0)
  }

  test("quantizedTopK agrees with the exact ranking on separated vectors") {
    val corpus = vecs(
      (0L, Seq(1.0f, 0.05f, 0.0f)),   // query
      (1L, Seq(0.9f, 0.1f, 0.0f)),    // near the query
      (2L, Seq(-0.8f, 0.6f, 0.0f)),   // far
      (3L, Seq(0.0f, 0.0f, 1.0f)))    // orthogonal
    val top = VectorOps.quantizedTopK(corpus.filter(col("vec_id") === 0), corpus, k = 3)
      .select("rk", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(top(1L) == 1L, "nearest neighbor survives quantization")
    assert(top(3L) == 2L && top(2L) == 3L, "orthogonal beats opposite")
  }

  test("mmrTopK: diversity beats a clone of the first pick at lambda=0.5") {
    // query (1,0); 101 and its exact clone 102 at +45.5°, 103 mirrored
    // at -45.5°. rel(103)=rel(101) but sim(103,101)≈-0.02 while the
    // clone's sim is 1.0 — greedy step 2 must pick 103, then the clone.
    val q = vecs((1L, Seq(1.0f, 0.0f)))
    val corpus = vecs(
      (101L, Seq(0.7f, 0.714f)),
      (102L, Seq(0.7f, 0.714f)),
      (103L, Seq(0.7f, -0.714f)))
    val out = VectorOps.mmrTopK(q, corpus, shortlist = 3, k = 3)
      .orderBy("sel_rk").select("neighbor_id").as[Long].collect().toSeq
    assert(out == Seq(101L, 103L, 102L))
  }
}
