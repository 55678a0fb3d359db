package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IngestStream

/** Self-oracle for the `stream_ingest` entry: the streaming form runs the
  * SAME [[graft.operators.PipelineOps.flagIngestBatch]] per micro-batch
  * that the oracle-gated `pipeline_ingest_batch` capstone runs once, so
  * the accumulated stream decisions must equal the batch decisions
  * EXACTLY — and the run must actually have been split across multiple
  * micro-batches for the parity to mean anything (per-doc flags are
  * independent of micro-batch boundaries; this is what makes the
  * continuous form correct at any trigger cadence). */
class StreamIngestSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def key(r: Row) =
    (r.getLong(0), r.getDouble(1), r.getLong(2),
      r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))

  test("stream decisions equal the batch capstone across multiple micro-batches") {
    graft.functions.GraftFunctions.register(spark)
    val src = graft.streaming.CdcStream.readEventStream(
      spark, StreamingQueries.batchDocsDir(spark, dir), maxFilesPerTrigger = 1)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val batchIds = scala.collection.mutable.Set.empty[Long]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ingest_spec_ckpt_").toString
    val q = IngestStream.ingestSink(src, TextQueries.bandIndexFor(spark, dir),
      Tables.documents(spark, dir).filter(col("doc_id") < 10), ckpt,
      (flags, id) => buf.synchronized { batchIds += id; buf ++= flags.collect() })
    q.awaitTermination()

    assert(batchIds.size > 1,
      s"expected multiple micro-batches (4 source files), got $batchIds")
    val streamed = buf.map(key).toSet
    val batch = SparkEntry.queries("pipeline_ingest_batch")(spark, dir)
      .collect().map(key).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "streaming decisions diverged from the batch capstone")
  }
}
