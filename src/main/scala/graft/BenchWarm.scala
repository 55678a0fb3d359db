package graft

import org.apache.spark.sql.SparkSession

/** Two-pass steady-state benchmark — builder-owned (NOT the driver's
  * `Bench.scala`, which must keep its original single-line contract).
  *
  * Pass 1 of this main is comparable to the driver bench (first execution
  * of each plan: Catalyst planning + Janino codegen + data). Pass 2
  * re-instantiates the same plans warm, isolating per-query fixed cost
  * from data-proportional work. Results are recorded in COVERAGE.md per
  * round; the driver never runs this main.
  */
object BenchWarm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pass() = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val run1 = pass()
    val run2 = pass()
    def fmt(rs: Map[String, Double]) =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"total_pass1","value":${run1.values.sum},"unit":"sec","queries":${fmt(run1)},"sf":"$sfDir"}""")
    println(s"""{"metric":"total_warm","value":${run2.values.sum},"unit":"sec","queries":${fmt(run2)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
