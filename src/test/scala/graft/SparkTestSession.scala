package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (guide: one session per suite,
  * a single shared one is cheaper still and safe — tests only read). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
