package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Pins [[TextOps.distinctiveTerms]] semantics on a corpus small enough
  * to rank by hand: tf dominates, corpus-rare terms break tf ties (the
  * tf-idf intuition), and the term itself is the final tiebreak. */
class DistinctiveTermsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ranks by tf desc, then df asc, then term") {
    val docs = Seq(
      (1L, "apple apple banana cherry "), // tf: apple 2; banana/cherry tie on tf=1
      (2L, "banana banana cherry "),      // banana in 2 docs, cherry in all 3
      (3L, "cherry durian ")              // durian unique to doc 3
    ).toDF("doc_id", "text")
    val got = TextOps.distinctiveTerms(docs, "doc_id", "text", k = 2)
      .orderBy($"doc_id", $"rk")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    assert(got == List(
      // doc 1: apple tf=2 wins; banana (df=2) beats cherry (df=3) on the df tiebreak
      (1L, "apple", 2L, 1L, 1L), (1L, "banana", 1L, 2L, 2L),
      // doc 2: banana tf=2; cherry next
      (2L, "banana", 2L, 2L, 1L), (2L, "cherry", 1L, 3L, 2L),
      // doc 3: durian df=1 beats cherry df=3 on the tf=1 tie
      (3L, "durian", 1L, 1L, 1L), (3L, "cherry", 1L, 3L, 2L)))
  }
}
