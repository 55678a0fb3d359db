package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (test scope): decompose stream_ingest's warm cost
  * into (a) pure stream machinery over the same 4 files with an
  * identity sink, (b) 4× batch-mode flagIngestBatch, (c) the full
  * entry. */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the epochs out of band
    val docsDir = StreamingQueries.batchDocsDir(spark, dir)
    val band = TextQueries.bandIndexFor(spark, dir)
    spark.table(band).count()
    for (pass <- 1 to 2) {
      time(s"pass$pass identity-sink stream over 4 files") {
        val src = graft.streaming.CdcStream.readEventStream(spark, docsDir,
          maxFilesPerTrigger = 1)
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft_prof_ckpt_").toString
        val out = java.nio.file.Files
          .createTempDirectory("graft_prof_out_").toString
        val q = src.writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.coalesce(1).write.mode("append").parquet(out); () }
          .start()
        q.awaitTermination()
      }
      time(s"pass$pass 4x batch flagIngestBatch") {
        val bench = Tables.documents(spark, dir).filter(col("doc_id") < 10)
        val files = new java.io.File(docsDir).listFiles()
          .filter(_.getName.endsWith(".parquet")).sorted
        files.foreach { f =>
          graft.operators.PipelineOps.flagIngestBatch(spark,
            spark.read.parquet(f.toString), band, bench,
            "doc_id", "text").count()
        }
      }
      time(s"pass$pass full stream_ingest entry") {
        SparkEntry.queries("stream_ingest")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
