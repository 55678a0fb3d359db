package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.PipelineOps

/** Continuous ingestion curation: the streaming twin of the
  * `pipeline_ingest_batch` capstone. Docs arrive as a stream; each
  * micro-batch is flagged through [[PipelineOps.flagIngestBatch]] — the
  * SAME function the batch capstone gates, so the two forms cannot
  * drift — and handed to the sink callback with its batchId.
  *
  * 100 TB shape: this is the "index once per epoch, probe per batch"
  * contract running continuously — the standing band index and the
  * benchmark set are static sides (the index pre-bucketed, the
  * benchmark broadcast), so each micro-batch costs one shuffle of that
  * micro-batch and batch-sized joins, independent of corpus size.
  * Checkpointing gives at-least-once delivery of decision frames; an
  * idempotent downstream (flags are deterministic per doc) makes it
  * effectively-once, the same argument as [[CdcStream]]'s ack path. */
object IngestStream {

  def ingestSink(docStream: DataFrame, bandIndexTable: String,
      benchmark: DataFrame, checkpointDir: String,
      write: (DataFrame, Long) => Unit,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.5, minQuality: Double = 0.30,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        write(PipelineOps.flagIngestBatch(batch.sparkSession, batch,
          bandIndexTable, benchmark, idCol, textCol, threshold, minQuality),
          batchId)
      }
      .start()
}
