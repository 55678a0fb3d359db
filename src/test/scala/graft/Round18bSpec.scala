package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineOps, VectorOps}

/** Functional gates for the r18 continuation wave: DSIR importance
  * resampling (hashed-n-gram importance weights + deterministic top-n
  * resample) and Matryoshka prefix-dim serving.
  */
class Round18bSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("dsirWeights ranks target-like pool docs above unlike ones") {
    val s = spark
    import s.implicits._
    // target speaks "alpha beta gamma"; pool doc 1 speaks the target's
    // language, doc 2 a disjoint one — the importance ratio must order
    // them, with the bigram features reinforcing the unigram signal
    val target = Seq((100L, "alpha beta gamma alpha beta"),
      (101L, "beta gamma alpha")).toDF("doc_id", "text")
    val pool = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val w = PipelineOps.dsirWeights(target, pool, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w.keySet == Set(1L, 2L))
    assert(w(1L) > w(2L),
      s"target-like doc must outscore the disjoint one: $w")
  }

  test("dsirWeights covers exactly the pool docs and counts features") {
    val s = spark
    import s.implicits._
    val target = Seq((10L, "a b")).toDF("doc_id", "text")
    val pool = Seq((1L, "x y z")).toDF("doc_id", "text")
    val rows = PipelineOps.dsirWeights(target, pool, "doc_id", "text")
      .collect()
    assert(rows.length == 1)
    // 3 unigrams + 2 bigrams
    assert(rows.head.getLong(1) == 5L)
  }

  test("dsirSelect returns n ranked rows, logw non-increasing") {
    val docs = Tables.documents(spark, sfDir)
    val sel = PipelineOps.dsirSelect(PipelineOps.dsirWeights(
        target = docs.filter(col("lang") === "en"),
        pool = docs.filter(col("lang") =!= "en"),
        "doc_id", "text"), "doc_id", n = 20)
      .orderBy(col("rk")).collect()
    assert(sel.length == 20)
    assert(sel.map(_.getLong(3)).toSeq == (1L to 20L))
    val ws = sel.map(_.getLong(2))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b },
      "selection must be ranked by logw desc")
  }

  test("mrlTopK serves k exact-cosine-ranked rows per query") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
    val out = VectorOps.mrlTopK(emb.filter(col("vec_id") < 10), emb,
        k = 3, prefixDims = 32, shortlist = 100).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L))
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("mrl recall@3 holds the 0.9 floor on the fixture") {
    val rec = SparkEntry.queries("sim_ann_mrl_recall")(spark, sfDir)
      .agg(avg(col("recall"))).collect().head.getDouble(0)
    assert(rec >= 0.9, s"mrl recall regressed: $rec")
  }
}
