package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SearchOps

/** Retrieval contracts: conjunctive semantics (ALL terms required),
  * deterministic tf ranking, and the k cut. */
class SearchOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark window spark query"),   // both terms, tf(spark)=2
    (2L, "spark window window window"), // both, higher total tf
    (3L, "spark spark spark spark"),    // missing 'window' — excluded
    (4L, "window plain text here"))     // missing 'spark' — excluded
    .toDF("doc_id", "text")

  private lazy val idx = SearchOps.invertedIndex(docs, "doc_id", "text")

  test("invertedIndex counts term frequency per (term, doc)") {
    val tf = idx.as[(String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(tf(("spark", 1L)) == 2L && tf(("spark", 3L)) == 4L)
    assert(tf(("window", 2L)) == 3L)
    assert(!tf.contains(("window", 3L)))
  }

  test("searchAllTerms: AND semantics, tf-desc ranking, k cut") {
    val out = SearchOps.searchAllTerms(idx, Seq("spark", "window"), k = 10)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(out.map(_._1).toSeq == Seq(2L, 1L), "docs 3 and 4 lack a term")
    assert(out.map(_._2).toSeq == Seq(4L, 3L), "total tf ranks doc 2 first")
    val cut = SearchOps.searchAllTerms(idx, Seq("spark", "window"), k = 1)
      .as[(Long, Long, Long)].collect()
    assert(cut.map(_._1).toSeq == Seq(2L))
  }
}
