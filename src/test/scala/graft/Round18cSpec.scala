package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IngestStream

/** Functional gates for the DSIR CDC-maintenance loop (the ninth
  * streaming-maintained artifact, pure-additive merge).
  */
class Round18cSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("settled DSIR model equals the scratch recompute") {
    val row = SparkEntry.queries("stream_dsir_cdc_settle_check")(
      spark, sfDir).collect().head
    assert(row.getLong(1) == 0L, s"maintained vs scratch lambda diverged: $row")
    assert(row.getBoolean(2))
  }

  test("every wave scored, against its own post-merge model state") {
    val scores = SparkEntry.queries("stream_dsir_cdc_scored")(spark, sfDir)
      .collect()
    assert(scores.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // wave w arrivals carry ids in [100000*w, 100000*(w+1))
    scores.foreach { r =>
      val w = r.getLong(0); val id = r.getLong(1)
      assert(id >= 100000L * w && id < 100000L * (w + 1), s"mis-keyed: $r")
    }
  }

  test("target-language arrivals outscore others within a wave") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
    val scores = SparkEntry.queries("stream_dsir_cdc_scored")(spark, sfDir)
      .filter(col("wave") === 1L)
      .select((col("doc_id") - 100000L).as("doc_id"), col("logw"),
        col("n_feats"))
    val byLang = scores.join(docs, Seq("doc_id"))
      // per-token normalization so length doesn't confound the language
      // signal (logw is a sum over features)
      .groupBy(col("lang"))
      .agg(avg(col("logw").cast("double") /
        col("n_feats").cast("double")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byLang("en") > byLang("de") && byLang("en") > byLang("zh"),
      s"en arrivals must look most target-like: $byLang")
  }

  test("streaming attribution equals the batch window pass") {
    val a = SparkEntry.queries("stream_attribution")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val b = SparkEntry.queries("events_attribution")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(a == b, "two strings of keyed state must reproduce the window")
  }

  test("benford audit: digits 1-9, expected constants, ppm shares") {
    val rows = SparkEntry.queries("dq_benford_audit")(spark, sfDir)
      .collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((1L to 9L).toSet))
    val obsSum = rows.map(_.getLong(2)).sum
    assert(obsSum <= 1000000L && obsSum > 990000L,
      s"observed shares must total ~1e6 ppm: $obsSum")
    val exp = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(exp.get(1L).forall(_ == 301030L))
    assert(exp.get(9L).forall(_ == 45757L))
  }

  test("a replayed batch is a whole no-op (additive merge is ledgered)") {
    val base = StreamingQueries.dsirCdcTableFor(spark, sfDir)
    def total = spark.table(s"${base}_rcounts")
      .agg(sum(col("cr"))).collect().head.getLong(0)
    val before = total
    val replay = Tables.documents(spark, sfDir).limit(5)
      .select(col("doc_id"), col("text"), lit(1L).as("wave"))
    // batch 0 already drained through the sink — the ledger must gate
    IngestStream.applyDsirBatch(spark, base, replay, batchId = 0L)
    assert(total == before, "replay must not double-count the wave")
  }
}
