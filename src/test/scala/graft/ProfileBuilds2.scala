package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** [[ProfileBuilds]] for the TEXT and GRAPH epoch builds: search index
  * (tokenize-heavy), the late-interaction token-vector write, and the
  * full graph-index build (train + assign + kNN-descent edges).
  * Usage: runMain graft.ProfileBuilds2 [sfDir] [reps]
  */
object ProfileBuilds2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.{SearchOps, GraphOps, TextOps}
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val times = scala.collection.mutable.Map
      .empty[String, List[Double]].withDefaultValue(Nil)
    var n = 0
    def fresh(): (String, String) = {
      n += 1
      ("graft_profb2_" + n,
        java.nio.file.Files.createTempDirectory("graft_profb2_").toString)
    }
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      times(label) = (System.nanoTime() - t0) / 1e9 :: times(label)
    }
    for (rep <- 1 to reps) {
      locally { val (t, p) = fresh()
        time("writeSearchIndex") {
          SearchOps.writeSearchIndex(docs, "doc_id", "text", t, p) } }
      locally { val (t, p) = fresh()
        time("tokenVec write (current repo form)") {
          // mirror of TextQueries.tokenVecIndexFor's write body
          val d0 = docs
          val base =
            (if (d0.rdd.getNumPartitions <
                 spark.sparkContext.defaultParallelism) Tables.spread(d0)
             else d0)
          base.select(col("doc_id"),
              explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
            .withColumn("bucket", pmod(col("doc_id"), lit(32)))
            .repartition(col("bucket"))
            .withColumn("tv", TextOps.hashTokenVecExpr("tok"))
            .select(col("doc_id"), col("tok"), col("tv"), col("bucket"))
            .write.mode("overwrite").format("parquet").partitionBy("bucket")
            .option("path", p).saveAsTable(t) } }
      locally { val (t, p) = fresh()
        time("tokenVec write (r20 form)") {
          docs.select(col("doc_id"),
              explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
            .withColumn("tv", TextOps.hashTokenVecExpr("tok"))
            .withColumn("bucket", pmod(col("doc_id"), lit(32)))
            .write.mode("overwrite").format("parquet").partitionBy("bucket")
            .option("path", p).saveAsTable(t) } }
      locally { val (t, p) = fresh()
        time("writeGraphIndex (train+assign+descent)") {
          GraphOps.writeGraphIndex(emb, t, p, trainIters = 2) } }
      println(s"[profile] rep $rep done")
    }
    println("[profile] === min over " + reps + " reps ===")
    times.toSeq.sortBy(_._1).foreach { case (l, ts) =>
      println(f"[profile] MIN $l ${ts.min}%.2f (all: ${ts.reverse.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
