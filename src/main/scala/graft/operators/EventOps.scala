package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch analogs of the streaming event operators (SURVEY §2.3): JSON
  * property extraction, tumbling windows, gap-based sessionization,
  * latest-per-key compaction. The streaming forms live in
  * [[graft.streaming.CdcStream]]; these batch forms are oracle-testable
  * and share the same semantics.
  *
  * Time is carried as epoch-microsecond longs (`ts_us`) because the
  * source parquet is nanosecond-precision (Tables.events); integer window
  * math is exact and engine-portable.
  */
object EventOps {

  /** Tumbling-window start (epoch seconds) for a window of `seconds`.
    * Spark's `/` on longs is double division; subtracting the modulus
    * keeps the arithmetic exact in integers (the final /1e6 divides a
    * multiple of 1e6 < 2^53, exact in double). */
  def tumblingWindowStart(tsUs: Column, seconds: Long): Column = {
    val winUs = lit(1000000L * seconds)
    ((tsUs - pmod(tsUs, winUs)) / lit(1000000L)).cast("long")
  }

  /** Tumbling-window aggregation: events per (window, event_type). */
  def tumblingAgg(events: DataFrame, seconds: Long): DataFrame =
    events
      .groupBy(tumblingWindowStart(col("ts_us"), seconds).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("sum_value"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapUs`. Classic
    * lag + cumulative-sum-of-flags window composition — one shuffle on
    * user_id, which is exactly the partitioning a 100 TB event log would
    * already have. */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val flagged = events.withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** Latest event per key — the batch form of CDC log compaction. */
  def latestPerKey(events: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    events.withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
  }

  /** Extract a JSON property (the `data jsonb` access pattern of the
    * reference, `sql/triggers.sql:67`) as a long. */
  def jsonProp(props: Column, key: String): Column =
    get_json_object(props, s"$$.$key").cast("long")
}
