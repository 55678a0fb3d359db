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

  /** Continuous ANN-index maintenance — the vector twin of
    * [[searchIndexSink]]: each arriving micro-batch of vectors is
    * assigned by the index's FROZEN coarse quantizer and inserted into
    * its list partitions via the same
    * [[graft.operators.VectorOps.appendToIvfIndex]] the batch path
    * gates. Per micro-batch cost: one broadcast-assign of the batch +
    * a dynamic-partition insert; the indexed corpus is never read.
    * Same at-least-once caveat and candidate-generation/swap answer as
    * [[searchIndexSink]]. */
  def ivfIndexSink(vecStream: DataFrame, table: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.VectorOps.appendToIvfIndex(
          batch.sparkSession, table, batch)
      }
      .start()

  /** Continuous retrieval-index maintenance: each arriving micro-batch
    * of documents is ADMITTED to a standing search index — posting rows
    * AND the BM25 norms sidecar appended under the index's layout via
    * the SAME [[graft.operators.SearchOps.appendToSearchIndex]] /
    * [[graft.operators.SearchOps.appendDocLengths]] the batch
    * maintenance path gates, so streaming and batch ingestion cannot
    * drift. The indexed corpus is never read or rewritten; each
    * micro-batch costs one tokenize + bucketed append of that batch.
    *
    * Delivery: the checkpoint gives at-least-once foreachBatch
    * execution; a REPLAYED batch would re-append its posting rows, so
    * effectively-once needs the downstream swap discipline — append
    * into a CANDIDATE generation and [[graft.operators.Generations]]
    * -swap after validation, or rebuild the generation from the epoch's
    * inputs on restart (the spec exercises the clean-run path; restart
    * semantics are CdcStream's documented territory). */
  def searchIndexSink(docStream: DataFrame, table: String,
      checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      numBuckets: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.SearchOps.appendToSearchIndex(
          batch.sparkSession, table, batch, idCol, textCol, numBuckets)
        graft.operators.SearchOps.appendDocLengths(
          batch.sparkSession, table, batch, idCol, textCol)
      }
      .start()
}
