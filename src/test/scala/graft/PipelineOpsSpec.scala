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
