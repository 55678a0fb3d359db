package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Similarity search over `embeddings` (SURVEY §2.3): brute-force cosine
  * top-k (exact baseline), sign-bucket LSH ANN (scale path), and
  * embedding-cosine near-dup detection. */
object SimilarityQueries {

  /** Small fixed query set — realistic ANN usage (broadcast side). */
  private def querySet(emb: DataFrame): DataFrame = emb.filter(col("vec_id") < 10)

  /** Corpus with exact-duplicate vectors injected (every 4th vector) for
    * the near-dup query; built identically in the oracle. */
  private def dupVectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"), col("label")).unionAll(
      emb.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label")))

  private val dupVectorsSql =
    """corpus AS (
      |  SELECT vec_id, embedding, label FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, embedding, label FROM embeddings WHERE vec_id % 4 = 0)""".stripMargin

  /** DuckDB cosine mirror of VectorOps.cosine (double accumulation). */
  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[])))"

  private val bucketSql: String => String = v =>
    (0 until 4).map(i => s"(CASE WHEN ($v)[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)").mkString(" + ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim_topk_brute" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      VectorOps.bruteForceTopK(querySet(emb), emb, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
        .orderBy(col("query_id"), col("rk"))
    }),

    "sim_ann_lsh" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      VectorOps.lshTopK(querySet(emb), emb, k = 3, bits = 4)
        .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rk"))
        .orderBy(col("query_id"), col("rk"))
    }),

    "sim_cosine_neardup" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      VectorOps.cosineNearDupPairs(dupVectors(Tables.embeddings(s, dir)),
          threshold = 0.995, bucketCol = "label")
        .orderBy(col("id_a"), col("id_b"))
    }))

  def oracle: Map[String, String] = Map(
    "sim_topk_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT query_id, c.vec_id AS neighbor_id,
        |    round(${cosSql("qv", "c.embedding")}, 6) AS cos_sim
        |  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> query_id),
        |ranked AS (SELECT *, row_number() OVER
        |  (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin,
    "sim_ann_lsh" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
        |    ${bucketSql("embedding")} AS qbucket FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
        |scored AS (
        |  SELECT query_id, c.vec_id AS neighbor_id,
        |    round(${cosSql("qv", "c.embedding")}, 6) AS cos_sim
        |  FROM c JOIN q ON c.bucket = q.qbucket AND c.vec_id <> q.query_id),
        |ranked AS (SELECT *, row_number() OVER
        |  (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= 3
        |ORDER BY query_id, rk""".stripMargin,
    "sim_cosine_neardup" -> {
      val sb2 = (0 until 2).map(i =>
        s"(CASE WHEN (embedding)[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)").mkString(" + ")
      s"""WITH $dupVectorsSql,
        |v AS (SELECT label::VARCHAR || '#' || ($sb2)::VARCHAR AS bucket,
        |  vec_id, embedding FROM corpus)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS cos_sim
        |FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE round(${cosSql("a.embedding", "b.embedding")}, 6) >= 0.995
        |ORDER BY id_a, id_b""".stripMargin
    })
}
