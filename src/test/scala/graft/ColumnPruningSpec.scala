package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.scalatest.funsuite.AnyFunSuite

/** Column pruning as a regression gate: at 100 TB a scan that reads
  * columns the query never uses is pure wasted IO, and it regresses
  * silently (a stray reference in a projection is enough). Pins the
  * exact required-schema of the parquet scans for representative
  * queries across the surface. */
class ColumnPruningSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def scanColumns(df: DataFrame): Seq[Set[String]] = {
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)
    nodes(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f.requiredSchema.fieldNames.toSet
    }
  }

  private def assertPruned(name: String, allowed: Set[String]): Unit = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scans = scanColumns(SparkEntry.queries(name)(spark, dir))
      assert(scans.nonEmpty, s"$name: no file scans found")
      for (s <- scans)
        assert(s.subsetOf(allowed),
          s"$name: scan reads ${s -- allowed} beyond the needed $allowed")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("events_funnel reads only (ts, user_id, event_type)") {
    assertPruned("events_funnel", Set("ts", "user_id", "event_type"))
  }

  test("events_retention reads only (ts, user_id)") {
    assertPruned("events_retention", Set("ts", "user_id"))
  }

  test("text_token_count reads only (doc_id, text)") {
    assertPruned("text_token_count", Set("doc_id", "text"))
  }

  test("q6_revenue_filter reads only its filter/agg columns") {
    assertPruned("q6_revenue_filter",
      Set("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"))
  }

  test("sim_topk_brute reads only (vec_id, embedding)") {
    assertPruned("sim_topk_brute", Set("vec_id", "embedding"))
  }

  test("sim_ann_ivf_stats reads NO data columns (partition values + counts only)") {
    // the monitoring query's "near-metadata cost" claim, pinned: its
    // only scan is the lists table, and `list_id` is a PARTITION column
    // (resolved from the directory layout), so the parquet scan's
    // required data schema must be empty
    assertPruned("sim_ann_ivf_stats", Set.empty)
  }

  test("sim_ann_ivf_retrain_check reads NO data columns either") {
    // the retrain DECISION inherits the monitor's cost contract: the
    // verdict over the appended generation is still a partition-column
    // + count aggregation, one output row, zero data bytes
    assertPruned("sim_ann_ivf_retrain_check", Set.empty)
  }

  test("dedup_band_stats reads only (band, bkey)") {
    // band monitoring never touches the doc ids or shingle sets — the
    // bucket-size distribution needs the two grouping columns only
    assertPruned("dedup_band_stats", Set("band", "bkey"))
  }

  test("text_search_stats reads only (term)") {
    // posting-list skew needs df per term — doc_id and tf stay unread
    assertPruned("text_search_stats", Set("term"))
  }
}
