package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.VectorOps

/** Gates [[VectorOps.cosineIncrementalPairs]] — the embedding twin of the
  * incremental text dedup contract: cross-boundary semantics (batch ×
  * corpus only, batch-internal pairs withheld) and the zero-shuffle
  * ingestion plan (corpus streams past the broadcast batch; nothing
  * exchanges). */
class IncrementalCosineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def vecs(rows: (Long, Array[Float], Int)*): DataFrame =
    rows.toDF("vec_id", "embedding", "label")

  private val base = Array.tabulate(8)(i => (i + 1).toFloat)
  private def nudged(eps: Float) = base.updated(0, base(0) + eps)

  test("cross pairs only; batch-internal near-dups never appear") {
    graft.functions.GraftFunctions.register(spark)
    val corpus = vecs((1L, base, 0), (2L, Array.fill(8)(-1f), 0))
    val batch = vecs((10L, nudged(0.001f), 0), (11L, nudged(0.002f), 0))
    val got = pairs(VectorOps.cosineIncrementalPairs(corpus, batch,
      threshold = 0.995, bucketCol = "label"))
    // 10 and 11 are near-copies of corpus vec 1 AND of each other; the
    // 10~11 pair is batch-internal and must be withheld
    assert(got.map(t => (t._1, t._2)) == Set((10L, 1L), (11L, 1L)),
      s"expected exactly the two cross pairs, got $got")
    assert(got.forall(_._3 >= 0.995))
  }

  test("equals the cross subset of the full cosineNearDupPairs pass") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val all = emb.select(col("vec_id"), col("embedding"), col("label")).unionAll(
      emb.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label")))
    val full = VectorOps.cosineNearDupPairs(all, 0.995, "label")
      .filter(col("id_a") < 100000 && col("id_b") >= 100000)
      .select(col("id_b").as("new_id"), col("id_a").as("old_id"), col("cos_sim"))
    val inc = VectorOps.cosineIncrementalPairs(
      all.filter(col("vec_id") < 100000),
      all.filter(col("vec_id") >= 100000), 0.995, "label")
    val (f, i) = (pairs(full), pairs(inc))
    assert(i.nonEmpty, "sf0.001 dup vectors must produce cross pairs")
    assert(i == f)
  }

  test("the operator plan has zero exchanges — the corpus never shuffles") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val inc = VectorOps.cosineIncrementalPairs(
        emb, emb.filter(col("vec_id") < 10), 0.995, "label")
      def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)
      val shuffles = nodes(inc.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"ingestion near-dup should be a broadcast-join-only plan, found:\n$shuffles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
