package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Self-oracle for the streaming entries (VERDICT r2 #4): the DuckDB gate
  * cannot express Structured Streaming, but `stream_tumbling` and
  * `stream_sessions` have exact batch twins (`events_tumbling`,
  * `events_sessionize`) that ARE hash-matched against DuckDB. Asserting
  * streaming == batch on the same data transfers the oracle:
  *  - every window the stream emits must equal the batch row exactly;
  *  - the only rows the stream may withhold are windows still OPEN at the
  *    final watermark (the append-mode contract — ADVICE r2 notes the
  *    row-count shrinkage is by design, this pins it).
  */
class StreamBatchParitySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val maxTsUs: Long =
    Tables.events(spark, dir).agg(max(col("ts_us"))).collect()(0).getLong(0)

  /** Spark tracks event-time watermarks at MILLISECOND precision, so the
    * reference watermark must be ms-truncated too — a raw µs value could
    * sit up to 999µs ahead of Spark's and flag a phantom "closed window
    * not emitted". */
  private def watermarkUsAfter(delayMs: Long): Long =
    (maxTsUs / 1000 - delayMs) * 1000

  /** Shared window-parity assertion: every emitted (window, type) row
    * equals the batch twin exactly; withheld rows must still be open at
    * the final watermark (append-mode contract). */
  private def assertWindowParity(streamName: String, batchName: String,
      windowLenSec: Long): Unit = {
    // window_start is already the batch twin's integer-seconds form
    // (the r15 oracle promotion normalized the streamed schema)
    val streamed = SparkEntry.queries(streamName)(spark, dir)
      .select(col("window_start").cast("long"), col("event_type"),
        col("n"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = SparkEntry.queries(batchName)(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      .toMap
    assert(streamed.nonEmpty, "stream must emit closed windows")
    streamed.foreach { case (k, v) =>
      assert(batch.get(k).contains(v), s"window $k: stream=$v batch=${batch.get(k)}")
    }
    // watermark after the final batch = max event time - 30 min delay
    val watermarkUs = watermarkUsAfter(30L * 60 * 1000)
    (batch.keySet -- streamed.keySet).foreach { case (ws, et) =>
      val endUs = (ws + windowLenSec) * 1000000L
      assert(endUs > watermarkUs,
        s"withheld window ($ws,$et) ends at $endUs <= watermark $watermarkUs — " +
          "a CLOSED window was not emitted")
    }
  }

  test("stream_envelope == batch insertEvents on deterministic columns") {
    // The envelope stream has no window/watermark semantics — every input
    // row yields exactly one output row — so parity is total equality on
    // the deterministic columns (uuid/created_at are per-run by design;
    // reference consume-path tests: main_test.go:15-101).
    val streamed = SparkEntry.queries("stream_envelope")(spark, dir)
    val streamRows = streamed
      .select(col("external_id"), col("statement"), col("data"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sorted
    // Batch twin over the RAW parquet schema (Tables.events appends
    // ts_us/ts_sec, which would change the JSON payload), normalized to
    // the same epoch-nanos ts contract the stream source applies.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = Tables.normalizeTsNanos(spark.read.parquet(s"$dir/events.parquet"))
    val batchRows = graft.operators.CdcOps.insertEvents(raw, "events", "user_id")
      .select(col("external_id"), col("statement"), col("data"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sorted
    assert(streamRows.nonEmpty, "envelope stream must emit rows")
    assert(streamRows.length == batchRows.length,
      s"row counts differ: stream=${streamRows.length} batch=${batchRows.length}")
    streamRows.zip(batchRows).zipWithIndex.foreach { case ((s, b), i) =>
      assert(s == b, s"sorted row $i differs: stream=$s batch=$b")
    }
    // the non-deterministic wire columns still satisfy the envelope
    // contract — since r18 the gated entry projects them out (it gates
    // the deterministic columns), so check them on a direct envelope
    // run over the same source
    val envelope = graft.streaming.CdcStream.toEnvelope(
      graft.streaming.CdcStream.readEventStream(spark,
        s"$dir/events.parquet"), "events", "user_id")
    val name = "graft_parity_envelope_meta"
    val q = envelope.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val meta = spark.table(name).agg(
      count(lit(1)), countDistinct(col("uuid")),
      count(when(col("uuid").isNull || col("created_at").isNull, 1))).collect()(0)
    assert(meta.getLong(0) == meta.getLong(1), "uuids must be unique per event")
    assert(meta.getLong(2) == 0, "uuid/created_at must be non-null")
  }

  test("stream_tumbling == events_tumbling on closed windows; withheld windows are open") {
    assertWindowParity("stream_tumbling", "events_tumbling", windowLenSec = 600)
  }

  test("stream_sliding == events_sliding on closed windows; withheld windows are open") {
    assertWindowParity("stream_sliding", "events_sliding", windowLenSec = 600)
  }

  test("stream_sessions == events_sessionize on closed sessions; withheld sessions are open") {
    val streamed = SparkEntry.queries("stream_sessions")(spark, dir)
      .select(col("user_id"), col("session_start_us"),
        col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = SparkEntry.queries("events_sessionize")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"), r.getAs[Double]("sum_value")))
      .toMap
    assert(streamed.nonEmpty, "stream must emit closed sessions")
    val gapUs = 30L * 60 * 1000000
    val watermarkUs = watermarkUsAfter(30L * 60 * 1000) // 30 min delay
    streamed.foreach { case (k, (n, sv)) =>
      val b = batch.get(k)
      assert(b.isDefined, s"session $k emitted by the stream but absent in batch")
      assert(b.exists { case (bn, _, bsv) => bn == n && bsv == sv },
        s"session $k: stream=($n,$sv) batch=$b")
    }
    val withheld = batch.keySet -- streamed.keySet
    withheld.foreach { case k @ (_, startUs) =>
      val (_, durationUs, _) = batch(k)
      // a session closes when watermark passes lastEvent + gap
      val closeUs = startUs + durationUs + gapUs
      assert(closeUs > watermarkUs,
        s"withheld session $k closes at $closeUs <= watermark $watermarkUs — " +
          "a CLOSED session was not emitted")
    }
  }
}
