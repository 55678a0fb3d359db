package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated testdata
  * (`/root/testdata/sf{0.001,0.01,0.1}` — see TESTDATA.md / FIXTURES.md §B).
  *
  * All operators take an `sfDir` so the same plan runs at any scale factor;
  * at 100 TB the only change is the path (and a real cluster master). Reads
  * are plain `spark.read.parquet`, so Catalyst's predicate pushdown, column
  * pruning and partition pruning all apply to whatever is layered on top.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; with `nanosAsLong` it arrives as a BIGINT of epoch
    * nanoseconds (exact — no truncation), and `ts_us`/`ts_sec` derived
    * columns give µs/second granularity for window math. The DuckDB oracle
    * side uses `epoch_ns(ts)` for the same integers.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_sec", expr("ts div 1000000000"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
