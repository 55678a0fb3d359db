package graft

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke: SparkEntry.entry must return
  * rows > 0 on sf0.001. Prints the row count and a sample row. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(2, truncate = 120)
    require(n > 0, "entry returned 0 rows")
    spark.stop()
  }
}
