package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CdcStream, FunnelStream}
import graft.operators.EventOps

/** The streaming funnel's core promise: out-of-order arrival (across
  * micro-batches) converges to EXACTLY the batch cascade — including the
  * nasty case where a late-arriving earlier signup lowers t1 and
  * re-qualifies a click the old t1 had discarded. */
class FunnelStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeOne(dir: String, name: String,
      rows: Seq[(Long, String, Long)]): Unit = {
    val tmp = Files.createTempDirectory("fs_part_").toString
    rows.toDF("user_id", "event_type", "ts_us")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(part.toPath, Paths.get(dir, name))
    Thread.sleep(20)
  }

  test("out-of-order stream converges to the batch cascade") {
    val dir = Files.createTempDirectory("funnel_stream_").toString
    // u1: stages arrive in REVERSE order across batches
    // u2: a late earlier signup (b1) lowers t1; the click at 150 (b2)
    //     then re-qualifies ahead of the click at 600 seen first
    val b0 = Seq((1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "signup", 500L), (2L, "click", 600L))
    val b1 = Seq((1L, "signup", 100L), (2L, "signup", 100L))
    val b2 = Seq((2L, "click", 150L), (2L, "purchase", 160L))
    writeOne(dir, "b0.parquet", b0)
    writeOne(dir, "b1.parquet", b1)
    writeOne(dir, "b2.parquet", b2)

    val st = CdcStream.readEventStream(spark, dir, maxFilesPerTrigger = 1)
    val out = FunnelStream.runningFunnel(st, "user_id", "event_type", "ts_us",
      Seq("signup", "click", "purchase"))
    val q = out.toDF().writeStream.format("memory").queryName("fs_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // final state per user = its max-n_seen row
    val finalRows = spark.table("fs_out")
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("n_seen").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("reach")(0), col("reach")(1), col("reach")(2))
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

    val batch = EventOps.funnelReach(
        (b0 ++ b1 ++ b2).toDF("user_id", "event_type", "ts_us"),
        "user_id", "event_type", "ts_us", Seq("signup", "click", "purchase"))
      .select("user_id", "t1", "t2", "t3")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

    assert(finalRows == batch, "stream final state must equal the batch cascade")
    assert(finalRows(2L) == ((Some(100L), Some(150L), Some(160L))),
      "the late signup re-qualified the earlier click")
    assert(finalRows(1L) == ((Some(100L), Some(200L), Some(300L))))
  }
}
