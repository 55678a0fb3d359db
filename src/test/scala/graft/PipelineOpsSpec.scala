package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PipelineOps

/** Determinism properties the curation ops exist for: stable membership
  * under dataset growth, disjoint+exhaustive splits, exact quota. */
class PipelineOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(n: Int) =
    (0L until n.toLong).map(i => (i, if (i % 2 == 0) "en" else "de", s"doc $i body"))
      .toDF("doc_id", "lang", "text")

  test("split is disjoint, exhaustive, and stable when the dataset grows") {
    val small = PipelineOps.trainValTestSplit(docs(100), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val big = PipelineOps.trainValTestSplit(docs(300), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(big.size == 300)
    // every doc of the small run keeps its split in the big run
    small.foreach { case (id, s) => assert(big(id) == s, s"doc $id moved splits") }
    assert(big.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("stratified sample honors per-stratum rates and is repeatable") {
    val df = docs(400)
    val a = PipelineOps.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 10), defaultPercent = 90).select("doc_id").as[Long].collect().toSet
    val b = PipelineOps.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 10), defaultPercent = 90).select("doc_id").as[Long].collect().toSet
    assert(a == b, "sampling must be deterministic")
    val en = a.count(_ % 2 == 0).toDouble / 200
    val de = a.count(_ % 2 == 1).toDouble / 200
    assert(en < 0.25 && de > 0.75, s"rates off: en=$en de=$de")
  }

  test("quota mixing returns exactly quota rows per stratum") {
    val out = PipelineOps.mixByQuota(docs(100), "doc_id", "lang",
      Map("en" -> 7), defaultQuota = 3)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("en" -> 7L, "de" -> 3L))
  }

  test("tokenBudgetSelect: quality-first cut, at-most-one-doc overshoot, per stratum") {
    // en: quality order is by _q desc — here all docs share the tokens so
    // order falls to doc_id; budget 10 over 4-token docs keeps 3 docs
    // (cum 4,8,12 — the 12 overshoots by one doc, the 4th is cut)
    val df = (0L until 8L).map(i =>
        (i, if (i < 4) "en" else "de", "tok tok tok tok"))
      .toDF("doc_id", "lang", "text")
    val out = PipelineOps.tokenBudgetSelect(df, "doc_id", "lang",
        lit(1.0), graft.operators.TextOps.tokenCount(col("text")), budgetTokens = 10L)
      .select("lang", "doc_id", "cum_tokens").as[(String, Long, Long)].collect()
    val byLang = out.groupBy(_._1)
    assert(byLang("en").map(_._2).sorted.toSeq == Seq(0L, 1L, 2L),
      "3 docs kept: the third overshoots (12 > 10), the fourth is cut")
    assert(byLang("de").map(_._2).sorted.toSeq == Seq(4L, 5L, 6L),
      "each stratum gets its own budget")
    assert(out.forall { case (_, _, cum) => cum - 4 < 10 })
  }

  test("packSequences: contiguous offsets, pack ids at ctx boundaries, totals preserved") {
    // 6 docs of 4 tokens each in ONE stratum → offsets 0,4,…,20; ctx=8
    // → packs {0,0},{1,1},{2,2} by starting offset
    val df = (0L until 6L).map(i => (i, "en", "a b c d")).toDF("doc_id", "lang", "text")
    val out = PipelineOps.packSequences(df, "doc_id", "text", "lang", ctxTokens = 8L)
      .orderBy("pack_id")
      .select("pack_id", "n_docs", "total_tokens", "pack_start_tok")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(out == List((0L, 2L, 8L, 0L), (1L, 2L, 8L, 8L), (2L, 2L, 8L, 16L)), s"got $out")
    // token mass is partitioned, never lost or duplicated
    assert(out.map(_._3).sum == 24L)
  }

  test("repetitionScore: 0 for unique/short docs, →1 for a looping n-gram") {
    import graft.operators.TextOps
    val df = Seq(
      (1L, "a b c d e"),       // all 3-grams distinct → 0
      (2L, "x y"),             // too short for a shingle → 0
      (3L, "w w w w w w w w")) // one repeated 3-gram: 6 shingles, 1 distinct
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextOps.repetitionScore(TextOps.tokens(col("text"))).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0 && got(2L) == 0.0)
    assert(got(3L) == math.floor((1.0 - 1.0 / 6.0) * 1e6) / 1e6, s"got ${got(3L)}")
  }

  test("ivfTopK probing every list equals brute force (IVF is exact at nProbe = K)") {
    import graft.operators.VectorOps
    graft.functions.GraftFunctions.register(spark)
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 13 + d * 5) % 9 - 4).toFloat / 3f))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cos_sim", "rk")
        .as[(Long, Long, Double, Long)].collect().toSet
    val brute = rows(VectorOps.bruteForceTopK(queries, vecs, k = 4))
    val ivfAll = rows(VectorOps.ivfTopK(queries, vecs, k = 4,
      numCentroids = 8, nProbe = 8))
    assert(ivfAll == brute, "probing all inverted lists must recover the exact top-k")
    // and with a partial probe the result is a subset-ranking over fewer candidates
    val ivfPart = VectorOps.ivfTopK(queries, vecs, k = 4, numCentroids = 8, nProbe = 2)
    assert(ivfPart.count() > 0)
  }

  test("quality quantile keeps ceil(frac) best per stratum, id-tie-broken") {
    // stratum A: 5 docs, ceil(5*0.25)=2 kept; stratum B: 1 doc, ceil=1 —
    // every stratum keeps at least one doc, so the mix survives the cut.
    // Docs 1 and 2 are identical text (tied quality): the doc_id order
    // must deterministically keep the lower id at the boundary.
    val rich = "the quick brown fox jumps over the lazy dog and runs far " * 4
    val docs = Seq(
      (1L, "a", rich), (2L, "a", rich), (3L, "a", "tiny"),
      (4L, "a", "x y"), (5L, "a", "z"),
      (6L, "b", "solitary stratum text")).toDF("doc_id", "source", "text")
    val kept = PipelineOps.qualityQuantileFilter(docs, "doc_id", "source", "text",
        keepFrac = 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 6L))
  }

  test("decontamination flags exactly the docs sharing a shingle") {
    val bench = Seq((1000L, "x", "alpha beta gamma delta")).toDF("doc_id", "lang", "text")
    val train = Seq(
      (1L, "x", "alpha beta gamma unrelated tail"),   // shares "alpha beta gamma"
      (2L, "x", "totally different words here now"))
      .toDF("doc_id", "lang", "text")
    val out = PipelineOps.decontaminate(train, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) == 1L)
  }
}
