package graft

import org.apache.spark.sql.SparkSession

/** Time a single query at a given sfDir, twice (cold + warm), to separate
  * plan/codegen overhead from data-proportional work. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(s"[timeone] run$i $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
