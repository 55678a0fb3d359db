package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints `explain("formatted")` for selected
  * queries (default: a representative set) so pushdown / broadcast /
  * whole-stage-codegen can be audited. Usage:
  *   runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q6_revenue_filter", "q5_region_volume",
        "cdc_snapshot", "dedup_minhash", "sim_topk_brute", "events_sessionize",
        "sim_ann_ivf", "pipeline_decontaminate", "pipeline_pack_sequences",
        "events_funnel", "dedup_crossdoc_ngrams", "sim_ann_ivf_sq8",
        "text_search_and", "join_salted_skew", "events_resample")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
