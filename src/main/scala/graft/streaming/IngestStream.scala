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
    * Same replay-ledger idempotence and candidate-generation answer as
    * [[searchIndexSink]]. */
  def ivfIndexSink(vecStream: DataFrame, table: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyIvfBatch(batch.sparkSession, table, batch, batchId)
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
    * Delivery (VERDICT r11 #5): the checkpoint gives at-least-once
    * foreachBatch execution — the restart replay case is a batch whose
    * writes completed but whose checkpoint commit didn't. The sinks
    * close exactly that case with a REPLAY LEDGER (`<table>_applied`,
    * one batch_id row written after the batch's appends): a replayed
    * batchId is skipped whole, so kill-and-restart does not double
    * postings, norms, or vectors (StreamIngestRestartSpec drives the
    * killed-drain + restart and pins the counts). The window that
    * remains is a crash INSIDE the batch body (data partially applied,
    * ledger unwritten → replay re-appends the applied part); that is
    * what the candidate-generation discipline is for — append into a
    * candidate, validate counts, then [[graft.operators.Generations]]
    * publish/swap — and why the ledger is written last (losing a batch
    * would be worse than re-applying one).
    *
    * Visibility: appends run in the stream's micro-batch session, which
    * refreshes ITS OWN catalog relation cache — a DIFFERENT session
    * that already scanned the index keeps its cached file listing until
    * `spark.catalog.refreshTable` (standard Spark cross-session
    * semantics; a first read after the drain is always fresh). The
    * sink's own ledger reads are refresh-safe — same session writes,
    * same session reads. */
  def searchIndexSink(docStream: DataFrame, table: String,
      checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      numBuckets: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applySearchBatch(batch.sparkSession, table, batch, idCol, textCol,
          numBuckets, batchId)
      }
      .start()

  /** One micro-batch of [[searchIndexSink]], replay-guarded: appends the
    * batch's postings + norms rows unless the ledger already holds this
    * batchId. Package-private so the restart spec can drive the exact
    * replay the checkpoint would. */
  private[graft] def applySearchBatch(
      spark: org.apache.spark.sql.SparkSession, table: String,
      batch: DataFrame, idCol: String, textCol: String, numBuckets: Int,
      batchId: Long): Unit =
    if (!alreadyApplied(spark, table, batchId)) {
      graft.operators.SearchOps.appendToSearchIndex(
        spark, table, batch, idCol, textCol, numBuckets)
      // numBuckets forwarded to BOTH appends: the sidecar append's own
      // default could otherwise disagree with a non-default index spec
      // and Spark rejects the mismatched bucketing
      graft.operators.SearchOps.appendDocLengths(
        spark, table, batch, idCol, textCol, numBuckets)
      recordApplied(spark, table, batchId)
    }

  /** One micro-batch of [[ivfIndexSink]], replay-guarded (same ledger
    * discipline as [[applySearchBatch]]). */
  private[graft] def applyIvfBatch(
      spark: org.apache.spark.sql.SparkSession, table: String,
      batch: DataFrame, batchId: Long): Unit =
    if (!alreadyApplied(spark, table, batchId)) {
      graft.operators.VectorOps.appendToIvfIndex(spark, table, batch)
      recordApplied(spark, table, batchId)
    }

  // The replay ledger: `<table>_applied`, one BIGINT batch_id row per
  // committed micro-batch. The existence probe is a driver-side take(1)
  // over a table with one row per micro-batch ever applied — tiny by
  // construction (thousands of rows after days of continuous
  // ingestion), and a control-flow decision the driver must make
  // anyway, not a data-path collect.
  private def alreadyApplied(spark: org.apache.spark.sql.SparkSession,
      table: String, batchId: Long): Boolean =
    spark.catalog.tableExists(s"${table}_applied") &&
      !spark.table(s"${table}_applied")
        .filter(org.apache.spark.sql.functions.col("batch_id") === batchId)
        .isEmpty

  private def recordApplied(spark: org.apache.spark.sql.SparkSession,
      table: String, batchId: Long): Unit = {
    import spark.implicits._
    Seq(batchId).toDF("batch_id")
      .write.mode("append").format("parquet")
      .saveAsTable(s"${table}_applied")
  }
}
