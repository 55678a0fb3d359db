package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r6 #6 / r8 #5: the empty-shingle guards in the dedup prep
  * pipelines are deliberately anchored ABOVE a pushdown barrier (the
  * posexplode Generate in minhash, the salt window in jaccard) — a
  * `filter(size(shingles) > 0)` placed on the projected frame gets
  * SUBSTITUTED through the projections and sunk into the file-scan
  * DataFilters, where the whole shingle chain re-runs at scan parallelism
  * once per union branch (measured 6× the entire prep cost at sf0.1).
  * That placement was protected only by comments
  * (`Dedup.scala` minhash/jaccard prep); this spec turns it into a
  * regression gate that fails if Catalyst ever re-sinks the guard (e.g.
  * on a Spark upgrade or a refactor that removes the barrier). */
class PushdownGuardSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  // any of these appearing inside a file-scan data filter means text
  // processing leaked below the repartition into the scan; legitimate
  // pushed filters here are only simple doc_id predicates + isnotnull
  private val forbidden =
    Seq("shingle", "md5", "transform(", "concat_ws", "element_at", "xdup")

  private def scanDataFilters(df: DataFrame): Seq[String] = {
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)
    nodes(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f.dataFilters.map(_.toString.toLowerCase)
    }.flatten
  }

  test("no shingle expression ever sinks into a file-scan DataFilter") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // keep the executed plan statically walkable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (name <- Seq("dedup_minhash", "dedup_jaccard_bucket", "dedup_incremental")) {
        val filters = scanDataFilters(SparkEntry.queries(name)(spark, dir))
        assert(filters.nonEmpty || name == "dedup_incremental",
          s"$name: expected at least the dup-corpus doc_id pushdowns")
        for (f <- filters; bad <- forbidden)
          assert(!f.contains(bad),
            s"$name: text-processing expression '$bad' was pushed into a " +
              s"file-scan DataFilter — the guard sank below the barrier:\n$f")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
