package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Semantics of [[Dedup.removeDuplicateSpans]] — exact-substring (span-
  * level) dedup: a `gramLen`-token window shared with ANOTHER document
  * is cut everywhere it appears, surrounding text kept. */
class SpanRemovalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: (Long, String)*): Map[Long, (String, Long)] =
    Dedup.removeDuplicateSpans(
        docs.toSeq.toDF("doc_id", "text"), "doc_id", "text", gramLen = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("a shared window is cut from every host, flanks survive") {
    val shared = "one two three four"
    val got = run(
      1L -> s"alpha $shared omega",
      2L -> s"beta gamma $shared")
    assert(got(1L) == (("alpha omega", 4L)))
    assert(got(2L) == (("beta gamma", 4L)))
  }

  test("overlapping duplicated windows erase the maximal span") {
    // a 6-token run shared between two docs = three overlapping 4-gram
    // windows; the union of their covers is exactly the 6-token span
    val shared = "a b c d e f"
    val got = run(1L -> s"pre $shared", 2L -> s"$shared post")
    assert(got(1L) == (("pre", 6L)))
    assert(got(2L) == (("post", 6L)))
  }

  test("within-document repetition alone is not cross-document") {
    // the same window twice in ONE doc: min(doc)==max(doc), kept whole
    val got = run(1L -> "x y z w x y z w", 2L -> "unrelated text here now")
    assert(got(1L) == (("x y z w x y z w", 0L)))
    assert(got(2L) == (("unrelated text here now", 0L)))
  }

  test("short documents and clean documents pass through byte-identical") {
    val got = run(
      1L -> "too short",
      2L -> "five distinct tokens right here",
      3L -> "wholly different words in this document")
    assert(got == Map(
      1L -> (("too short", 0L)),
      2L -> (("five distinct tokens right here", 0L)),
      3L -> (("wholly different words in this document", 0L))))
  }

  test("a fully shared document empties; n_removed = its token count") {
    val t = "p q r s t u"
    val got = run(1L -> t, 2L -> t)
    assert(got(1L) == (("", 6L)))
    assert(got(2L) == (("", 6L)))
  }
}
