package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{AttributionStream, CdcStream}

/** The TTL attribution path's eviction semantics (VERDICT r19 #5) on a
  * purpose-built fixture: a user idle past the horizon is RETIRED by
  * the EventTimeTimeout handler, so their next touch re-baselines ft —
  * first-touch-WITHIN-HORIZON — where the NoTimeout twin would still
  * credit the pre-gap touch. Wide-horizon parity with the NoTimeout
  * twin on the driver fixture is TtlStreamParitySpec's. */
class AttributionStreamSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val S = 1000000000L // one second of event time, in nanos

  private def writeOne(dir: String, name: String,
      rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    val tmp = Files.createTempDirectory("attr_part_").toString
    rows.toDF("user_id", "ts", "event_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(part.toPath, Paths.get(dir, name))
    Thread.sleep(20)
  }

  private def mkFixture(): String = {
    val dir = Files.createTempDirectory("attr_ttl_").toString
    // b0: u1 clicks at 1 s (not 0 — a row exactly at the initial
    //     watermark is dropped as late) → timeout armed at ~31 s
    // b1/b2: u9 pushes the watermark to ~101 s; b2 fires u1's timeout
    //        (a key only times out in a batch where it has no data)
    //        → u1's click is FORGOTTEN
    // b3: u1 signup at 102 s — fresh state, ft re-baselines
    // b4: u1 purchase at 103 s — credits the POST-expiry signup
    writeOne(dir, "b0.parquet", Seq((1L, 1L * S, 1L, "click", 0.0)))
    writeOne(dir, "b1.parquet", Seq((9L, 100L * S, 2L, "signup", 0.0)))
    writeOne(dir, "b2.parquet", Seq((9L, 101L * S, 3L, "signup", 0.0)))
    writeOne(dir, "b3.parquet", Seq((1L, 102L * S, 4L, "signup", 0.0)))
    writeOne(dir, "b4.parquet", Seq((1L, 103L * S, 5L, "purchase", 5.0)))
    dir
  }

  private def drain(out: org.apache.spark.sql.DataFrame,
      name: String): Map[Long, (String, String)] = {
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).filter(col("user") === 1L)
      .select(col("eid"), col("ft"), col("lt"))
      .as[(Long, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
  }

  test("ttl retires idle users; the returning purchase credits the re-baselined ft") {
    val st = CdcStream.readEventStream(spark, mkFixture(),
      maxFilesPerTrigger = 1)
    val got = drain(AttributionStream.attributeTtl(st,
      ttl = "30 seconds").toDF(), "attr_ttl_out")
    // the 103 s purchase must credit ft = lt = the 102 s signup — the
    // forgotten 1 s click leaking through would surface as ft=click
    assert(got == Map(5L -> (("signup", "signup"))), s"got $got")
  }

  test("the NoTimeout twin on the same fixture still credits the pre-gap click") {
    val st = CdcStream.readEventStream(spark, mkFixture(),
      maxFilesPerTrigger = 1)
    val got = drain(AttributionStream.attribute(st).toDF(), "attr_plain_out")
    assert(got == Map(5L -> (("click", "signup"))), s"got $got")
  }
}
