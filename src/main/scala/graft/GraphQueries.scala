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
        .orderBy(col("node"))))

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
        |ORDER BY a, b, c""".stripMargin)
}
