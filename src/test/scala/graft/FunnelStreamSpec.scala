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
    // u5: never reaches stage 1 — the batch twin emits no row for it,
    //     and neither may the stream (ADVICE r9 #2)
    val b0 = Seq((1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "signup", 500L), (2L, "click", 600L),
      (5L, "click", 100L), (5L, "purchase", 200L))
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
    assert(!finalRows.contains(5L) && !batch.contains(5L),
      "a user who never reached stage 1 must emit in NEITHER engine")
  }

  test("duplicate stage names are rejected up front") {
    // the batch cascade supports Seq("click","click"); stageExpr maps a
    // type to ONE index, so the stream rejects loudly instead of leaving
    // the first duplicate stage permanently empty (ADVICE r9 #2)
    val df = Seq((1L, "click", 100L)).toDF("user_id", "event_type", "ts_us")
    assertThrows[IllegalArgumentException] {
      FunnelStream.runningFunnel(df, "user_id", "event_type", "ts_us",
        Seq("click", "click"))
    }
  }

  test("ttl evicts idle users by event time; later events restart cleanly") {
    val dir = Files.createTempDirectory("funnel_ttl_").toString
    val S = 1000000L // one second of event time, in micros
    // b0: u1 signs up at t=1 s (not 0 — the initial watermark IS 0, and
    //     a row exactly at the watermark is dropped as late)
    //     → timeout armed at ~31 s of event time
    // b1/b2: u9 pushes the watermark to 100 s, then the next batch
    //        fires u1's timeout (a key only times out in a batch where
    //        it has no data) → u1's history is FORGOTTEN
    // b3: u1 click at 102 s — fresh state, stage 1 empty → NO emission
    //     (the stage-1 gate is what makes post-expiry output never mix
    //     forgotten history with new events)
    // b4: u1 signup at 103 s — emits a cascade over ONLY post-expiry
    //     events: t1=103 s, t2=None (the 102 s click precedes it)
    writeOne(dir, "b0.parquet", Seq((1L, "signup", 1L * S)))
    writeOne(dir, "b1.parquet", Seq((9L, "signup", 100L * S)))
    writeOne(dir, "b2.parquet", Seq((9L, "click", 101L * S)))
    writeOne(dir, "b3.parquet", Seq((1L, "click", 102L * S)))
    writeOne(dir, "b4.parquet", Seq((1L, "signup", 103L * S)))

    val st = CdcStream.readEventStream(spark, dir, maxFilesPerTrigger = 1)
    val out = FunnelStream.runningFunnel(st, "user_id", "event_type", "ts_us",
      Seq("signup", "click"), ttl = Some("30 seconds"))
    val q = out.toDF().writeStream.format("memory").queryName("fs_ttl_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val u1 = spark.table("fs_ttl_out").filter(col("user_id") === 1L)
      .select(col("n_seen"), col("reach")(0), col("reach")(1))
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(u1 == Set(
      (1L, Some(1L * S), None),        // b0: pre-expiry signup
      (2L, Some(103L * S), None)),     // b4: post-expiry restart
      s"got $u1")
    // no emission carried the forgotten t1=1s after expiry, and the b3
    // click alone emitted nothing
    assert(!u1.exists(r => r._1 >= 2 && r._2 == Some(1L * S)),
      "an emission mixed pre-expiry history into post-expiry state")
  }

  test("non-stage events advance the ttl eviction clock (ADVICE r10)") {
    val dir = Files.createTempDirectory("funnel_ttl_wm_").toString
    val S = 1000000L // one second of event time, in micros
    // "pageview" is NOT a funnel stage. Before the r10 fix the watermark
    // was applied AFTER the stage filter, so a stream of non-stage
    // traffic never advanced the eviction clock and idle-user state was
    // pinned for as long as stage events paused; u1's 102 s click would
    // then have merged with the forgotten 1 s signup and emitted
    // (n_seen=2, t1=1s, t2=102s).
    writeOne(dir, "b0.parquet", Seq((1L, "signup", 1L * S)))
    writeOne(dir, "b1.parquet", Seq((9L, "pageview", 100L * S)))
    writeOne(dir, "b2.parquet", Seq((9L, "pageview", 101L * S)))
    writeOne(dir, "b3.parquet", Seq((1L, "click", 102L * S)))

    val st = CdcStream.readEventStream(spark, dir, maxFilesPerTrigger = 1)
    val out = FunnelStream.runningFunnel(st, "user_id", "event_type", "ts_us",
      Seq("signup", "click"), ttl = Some("30 seconds"))
    val q = out.toDF().writeStream.format("memory").queryName("fs_ttl_wm_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val u1 = spark.table("fs_ttl_wm_out").filter(col("user_id") === 1L)
      .select(col("n_seen"), col("reach")(0), col("reach")(1))
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    // the pageview-driven watermark evicted u1 between b1 and b3, so the
    // post-expiry click found fresh state and the stage-1 gate held it
    assert(u1 == Set((1L, Some(1L * S), None)), s"got $u1")
  }
}
