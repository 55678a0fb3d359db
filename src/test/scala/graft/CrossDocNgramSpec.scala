package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Set semantics the cross-doc n-gram profile exists for: shared counts
  * come from OTHER documents only; within-doc repetition is excluded by
  * the per-doc distinct. */
class CrossDocNgramSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("shared counts cross docs; within-doc repetition does not inflate them") {
    // d1/d2 share exactly the 3-gram "a b c" (d2 repeats it — still ONE
    // distinct gram); d3 shares nothing; d4 too short for any 3-gram
    val docs = Seq(
      (1L, "a b c x"),          // grams: "a b c", "b c x"
      (2L, "a b c a b c"),      // grams: "a b c", "b c a", "c a b" (distinct)
      (3L, "p q r s"),          // grams: "p q r", "q r s"
      (4L, "t u")).toDF("doc_id", "text")
    val out = Dedup.crossDocNgramStats(docs, "doc_id", "text")
      .select("doc_id", "n_ngrams", "n_shared")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap

    assert(out.keySet == Set(1L, 2L, 3L), "doc 4 has no 3-gram, no row")
    assert(out(1L) == ((2L, 1L)), "doc 1: 2 distinct grams, 1 shared")
    assert(out(2L) == ((3L, 1L)),
      "doc 2: repetition collapses to 3 distinct grams, 1 shared with d1")
    assert(out(3L) == ((2L, 0L)))
  }

  test("shared_frac is floor-quantized n_shared/n_ngrams") {
    val docs = Seq((1L, "a b c x"), (2L, "a b c")).toDF("doc_id", "text")
    val fr = Dedup.crossDocNgramStats(docs, "doc_id", "text")
      .select("doc_id", "shared_frac").as[(Long, Double)].collect().toMap
    assert(fr(1L) == 0.5 && fr(2L) == 1.0)
  }
}
