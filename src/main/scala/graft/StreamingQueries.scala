package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured-Streaming-backed entries (no oracle — driver does a
  * rows-only check; contract allows omission from oracleSql). */
object StreamingQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
}
