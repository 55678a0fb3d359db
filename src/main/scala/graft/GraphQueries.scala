package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Oracle-gated graph-analytics queries over the co-purchase graph
  * (see [[graft.operators.GraphOps]] for the graph model and the
  * integer-ppb quantization that keeps Spark and DuckDB bit-equal). */
object GraphQueries {

  /** The backbone + 3-iteration PageRank CTE chain shared by the
    * oracle. Every intermediate state is AS MATERIALIZED — DuckDB
    * inlines CTEs per reference, and each rank state is referenced
    * through both the join and the next state (the r15 exponential
    * blow-up trap). */
  private val backboneSql =
    """SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // degree distribution of the FULL co-purchase graph
    "graph_degree" -> ((s, dir) =>
      GraphOps.degreeDistribution(Tables.lineitem(s, dir))
        .orderBy(col("deg"))),
    // 3-iteration damped PageRank on the support>=2 backbone, top-50
    "graph_pagerank" -> ((s, dir) =>
      GraphOps.pageRank(s, dir, iters = 3)
        .orderBy(col("rank_ppb").desc, col("node")).limit(50)),
    // exact triangle enumeration on the backbone
    "graph_triangles" -> ((s, dir) =>
      GraphOps.triangles(s, dir).orderBy(col("a"), col("b"), col("c"))),
    // 4-round min-label propagation: per-node component label (the
    // full label table is the gate — one histogram row would hide
    // every mis-propagated node)
    "graph_components_lp" -> ((s, dir) =>
      GraphOps.labelPropagation(s, dir, rounds = 4)
        .orderBy(col("node"))),
    // LSH-bucketed k-NN graph over the embedding corpus (k=3, 4 sign
    // bits) — the graph-construction half of graph-based semantic
    // clustering; full ranked edge table gated
    "graph_knn_edges" -> ((s, dir) =>
      GraphOps.knnEdges(s, dir)
        .select(col("src"), col("dst"), col("cos_sim"), col("rk"))
        .orderBy(col("src"), col("rk"))),
    // semantic clusters: 4-round min-label propagation over the
    // MUTUAL-kNN edge set, seeded with every corpus vector (isolated
    // vectors = singleton clusters) — per-node label table gated
    "graph_knn_components" -> ((s, dir) => {
      val nodes = Tables.embeddings(s, dir).select(col("vec_id").as("node"))
      GraphOps.labelPropagationOver(nodes,
          GraphOps.mutualKnnEdges(GraphOps.knnEdges(s, dir)), rounds = 4)
        .orderBy(col("node"))
    }))

  def oracle: Map[String, String] = Map(
    "graph_degree" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |sym AS (SELECT src AS node FROM pairs UNION ALL SELECT dst FROM pairs),
        |deg AS (SELECT node, count(*) AS deg FROM sym GROUP BY node)
        |SELECT deg, count(*) AS n_nodes FROM deg GROUP BY deg ORDER BY deg""".stripMargin,
    "graph_pagerank" ->
      s"""WITH backbone AS MATERIALIZED ($backboneSql),
        |sym AS MATERIALIZED (
        |  SELECT src, dst FROM backbone UNION ALL SELECT dst, src FROM backbone),
        |nn AS MATERIALIZED (SELECT count(DISTINCT src) AS n FROM sym),
        |deg AS MATERIALIZED (SELECT src AS node, count(*) AS outdeg FROM sym GROUP BY src),
        |r0 AS MATERIALIZED (
        |  SELECT DISTINCT src AS node, 1000000000 // (SELECT n FROM nn) AS r FROM sym),
        |base AS MATERIALIZED (
        |  SELECT (150 * (1000000000 // n)) // 1000 AS b FROM nn),
        |r1 AS MATERIALIZED (
        |  SELECT s.dst AS node,
        |    (SELECT b FROM base) + CAST(SUM((850 * r0.r) // (1000 * d.outdeg)) AS BIGINT) AS r
        |  FROM sym s JOIN r0 ON s.src = r0.node JOIN deg d ON s.src = d.node
        |  GROUP BY s.dst),
        |r2 AS MATERIALIZED (
        |  SELECT s.dst AS node,
        |    (SELECT b FROM base) + CAST(SUM((850 * r1.r) // (1000 * d.outdeg)) AS BIGINT) AS r
        |  FROM sym s JOIN r1 ON s.src = r1.node JOIN deg d ON s.src = d.node
        |  GROUP BY s.dst),
        |r3 AS MATERIALIZED (
        |  SELECT s.dst AS node,
        |    (SELECT b FROM base) + CAST(SUM((850 * r2.r) // (1000 * d.outdeg)) AS BIGINT) AS r
        |  FROM sym s JOIN r2 ON s.src = r2.node JOIN deg d ON s.src = d.node
        |  GROUP BY s.dst)
        |SELECT node, r AS rank_ppb FROM r3
        |ORDER BY rank_ppb DESC, node LIMIT 50""".stripMargin,
    "graph_components_lp" -> {
      def round(k: Int) =
        s"""l$k AS MATERIALIZED (
          |  SELECT l.node AS node, least(l.lab, min(p.lab)) AS lab
          |  FROM l${k - 1} l JOIN sym s ON s.dst = l.node
          |  JOIN l${k - 1} p ON p.node = s.src
          |  GROUP BY l.node, l.lab)"""
      s"""WITH backbone AS MATERIALIZED ($backboneSql),
        |sym AS MATERIALIZED (
        |  SELECT src, dst FROM backbone UNION ALL SELECT dst, src FROM backbone),
        |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lab FROM sym),
        |${(1 to 4).map(round).mkString(",\n")}
        |SELECT node, lab FROM l4 ORDER BY node""".stripMargin
    },
    "graph_triangles" ->
      s"""WITH backbone AS MATERIALIZED ($backboneSql)
        |SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |FROM backbone e1
        |JOIN backbone e2 ON e1.dst = e2.src
        |JOIN backbone e3 ON e3.src = e1.src AND e3.dst = e2.dst
        |ORDER BY a, b, c""".stripMargin,
    "graph_knn_edges" ->
      s"""WITH $knnSql
        |SELECT src, dst, cos_sim, rk FROM knn ORDER BY src, rk""".stripMargin,
    "graph_knn_components" -> {
      def round(k: Int) =
        s"""l$k AS MATERIALIZED (
          |  SELECT l.node AS node,
          |    least(l.lab, coalesce(min(p.lab), l.lab)) AS lab
          |  FROM l${k - 1} l LEFT JOIN msym s ON s.dst = l.node
          |  LEFT JOIN l${k - 1} p ON p.node = s.src
          |  GROUP BY l.node, l.lab)"""
      s"""WITH $knnSql,
        |mut AS MATERIALIZED (
        |  SELECT k1.src, k1.dst FROM knn k1
        |  JOIN knn k2 ON k2.src = k1.dst AND k2.dst = k1.src
        |  WHERE k1.src < k1.dst),
        |msym AS MATERIALIZED (
        |  SELECT src, dst FROM mut UNION ALL SELECT dst, src FROM mut),
        |l0 AS MATERIALIZED (SELECT vec_id AS node, vec_id AS lab FROM embeddings),
        |${(1 to 4).map(round).mkString(",\n")}
        |SELECT node, lab FROM l4 ORDER BY node""".stripMargin
    })

  /** DuckDB mirror of the [[GraphOps.knnGraphDir]] epoch: sign-bucketed
    * candidate self-join, per-src cosine top-3. Bucket and cosine
    * expressions match the SimilarityQueries LSH mirrors. */
  private lazy val knnSql: String = {
    val bucket = (v: String) => (0 until 4)
      .map(i => s"(CASE WHEN ($v)[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")
    val cos = "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / " +
      "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * " +
      "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
    s"""cb AS MATERIALIZED (SELECT vec_id, embedding,
      |    ${bucket("embedding")} AS bucket FROM embeddings),
      |pr AS MATERIALIZED (
      |  SELECT a.vec_id AS src, b.vec_id AS dst, round($cos, 6) AS cos_sim
      |  FROM cb a JOIN cb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
      |rkd AS (SELECT src, dst, cos_sim, CAST(row_number() OVER (
      |    PARTITION BY src ORDER BY cos_sim DESC, dst) AS BIGINT) AS rk
      |  FROM pr),
      |knn AS MATERIALIZED (SELECT src, dst, cos_sim, rk FROM rkd WHERE rk <= 3)""".stripMargin
  }
}
