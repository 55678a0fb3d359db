package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-style capability queries: joins, aggregations, windows, rollup,
  * set ops, top-k — the batch-analytics surface (SURVEY §2.3). */
object RelationalQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracle: Map[String, String] = Map()
}
