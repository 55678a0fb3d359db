package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** Pins the deterministic-BPE spec the DuckDB mirror re-implements:
  * greedy left-to-right non-overlapping apply, frequency-then-
  * lexicographic merge selection, lexicographic vocab ids, and the
  * order-sensitive checksum. */
class BpeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("applyMerge is left-to-right non-overlapping (aaaa → [aa, aa])") {
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "aa"))
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("x", "a", "b", "a", "b"), "a", "b").toSeq ==
      Seq("x", "ab", "ab"))
    assert(Bpe.applyMerge(Array("q"), "a", "b").toSeq == Seq("q"))
  }

  test("train picks max-count pair with lexicographic tie-break and merges cascade") {
    // "abab"×2: pairs (a,b)=4, (b,a)=2 → first merge (a,b); then
    // (ab,ab)=2 over state [ab,ab] → second merge (ab,ab)
    val m = Bpe.train(Seq(("abab", 2L)), nMerges = 2)
    assert(m.merges == Seq(("a", "b"), ("ab", "ab")))
    assert(m.wordSyms("abab").toSeq == Seq("abab"))
    // tie case: "xy" and "yx" each once — (x,y) vs (y,x) tie at 1,
    // lexicographic → (x,y)
    val t = Bpe.train(Seq(("xy", 1L), ("yx", 1L)), nMerges = 1)
    assert(t.merges == Seq(("x", "y")))
  }

  test("vocab ids are lexicographic over final symbols") {
    val m = Bpe.train(Seq(("abab", 2L), ("cd", 1L)), nMerges = 1)
    // states: [ab, ab], [c, d] → symbols {ab, c, d} → ids 0,1,2
    assert(m.vocab == Map("ab" -> 0, "c" -> 1, "d" -> 2))
  }

  test("encodeWord applies the trained merges to unseen words") {
    val m = Bpe.train(Seq(("abab", 2L)), nMerges = 1)
    assert(Bpe.encodeWord("aba", m.merges).toSeq == Seq("ab", "a"))
  }

  test("encodeDocs checksum is position-sensitive (gates token order)") {
    val m = Bpe.train(Seq(("ab", 5L), ("cd", 5L)), nMerges = 0)
    // vocab: a→0 b→1 c→2 d→3
    val docs = Seq((1L, "ab cd"), (2L, "cd ab")).toDF("doc_id", "text")
    val out = Bpe.encodeDocs(docs, m).collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).n_tokens == 4 && out(2L).n_tokens == 4)
    assert(out(1L).sum_ids == out(2L).sum_ids, "same bag of ids")
    // doc1: 0·1+1·2+2·3+3·4 = 20; doc2: 2·1+3·2+0·3+1·4 = 12
    assert(out(1L).checksum == 20L && out(2L).checksum == 12L,
      "checksum must distinguish orderings")
  }
}
