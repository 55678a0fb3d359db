package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CdcStream, IngestStream}
import graft.operators.{SearchOps, VectorOps}

/** Restart idempotence for the continuous index-maintenance sinks
  * (VERDICT r11 #5): a drain killed between micro-batches resumes from
  * the checkpoint WITHOUT re-admitting what was already applied, and a
  * REPLAYED micro-batch (the at-least-once case: writes done, checkpoint
  * commit lost) is skipped whole by the `<table>_applied` ledger — no
  * doubled postings, norms rows, or vectors. */
class StreamIngestRestartSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def uniq(p: String) =
    p + java.util.UUID.randomUUID().toString.replace("-", "")
  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("search sink: killed drain resumes from checkpoint without re-appending") {
    val baseDocs = Seq(
      (1L, "spark window spark query"),
      (2L, "spark window window window")).toDF("doc_id", "text")
    val wave1 = Seq(
      (3L, "spark catalyst window plans"),
      (4L, "window functions in spark")).toDF("doc_id", "text")
    val wave2 = Seq(
      (5L, "spark shuffle exchange plan"),
      (6L, "unrelated text entirely")).toDF("doc_id", "text")

    val table = uniq("graft_restart_search_")
    val fTable = table + "_f"
    val dirs = (1 to 6).map(_ => tmp("graft_restart_search_"))
    try {
      SearchOps.writeSearchIndex(baseDocs, "doc_id", "text", table, dirs(0),
        numBuckets = 4)
      SearchOps.writeDocLengths(spark, table, dirs(1), numBuckets = 4)

      // PHASE 1: two files arrive, the drain completes, the "process"
      // dies (the query object is gone; only the checkpoint survives)
      wave1.repartition(2).write.mode("overwrite").parquet(dirs(2))
      val src1 = CdcStream.readEventStream(spark, dirs(2), maxFilesPerTrigger = 1)
      IngestStream.searchIndexSink(src1, table, dirs(3), numBuckets = 4,
        trigger = Trigger.AvailableNow()).awaitTermination()
      assert(spark.table(s"${table}_doclens").count() == 4L)
      val ledgerAfter1 = spark.table(s"${table}_applied").count()
      assert(ledgerAfter1 >= 2L,
        s"one ledger row per applied micro-batch, got $ledgerAfter1")

      // PHASE 2: more files land; a NEW sink restarts on the SAME
      // checkpoint — wave1's files must not be re-admitted
      wave2.repartition(2).write.mode("append").parquet(dirs(2))
      val src2 = CdcStream.readEventStream(spark, dirs(2), maxFilesPerTrigger = 1)
      IngestStream.searchIndexSink(src2, table, dirs(3), numBuckets = 4,
        trigger = Trigger.AvailableNow()).awaitTermination()
      // the drain appended from the stream's micro-batch session; this
      // session scanned the tables after phase 1, so its cached file
      // listing must be refreshed (cross-session visibility — see the
      // sink's scaladoc)
      Seq(table, s"${table}_doclens", s"${table}_applied")
        .foreach(spark.catalog.refreshTable)
      val ledgerAfter2 = spark.table(s"${table}_applied").count()
      assert(ledgerAfter2 > ledgerAfter1,
        s"phase-2 batches must reach the ledger: $ledgerAfter1 → $ledgerAfter2")
      // exactly one norms row per doc — a re-admitted wave1 would double 3/4
      val dl = spark.table(s"${table}_doclens").groupBy(col("doc_id"))
        .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dl.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), s"missing docs: $dl")
      assert(dl.values.forall(_ == 1L), s"restart doubled norms rows: $dl")

      // and the drained index equals a fresh full build (tf + BM25)
      val allDocs = baseDocs.unionAll(wave1).unionAll(wave2)
      SearchOps.writeSearchIndex(allDocs, "doc_id", "text", fTable, dirs(4),
        numBuckets = 4)
      SearchOps.writeDocLengths(spark, fTable, dirs(5), numBuckets = 4)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq.map(_.toSeq)
      assert(rows(SearchOps.searchBm25(spark, table, Seq("spark", "window"), 10)) ==
        rows(SearchOps.searchBm25(spark, fTable, Seq("spark", "window"), 10)),
        "restarted drain diverged from a fresh full build")
    } finally Seq(table, fTable).foreach { t =>
      Seq(s"${t}_applied", s"${t}_doclens", t).foreach(x =>
        spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
  }

  test("replayed micro-batch is skipped whole by the CDC statement sinks") {
    // the statement-routed sinks have THREE side effects per batch
    // (immediate append, tombstone append, pending append) — a replay
    // must skip all of them together or the settle double-counts
    def ev(rows: (String, Long, String, Long)*) =
      rows.toSeq.toDF("statement", "doc_id", "text", "event_seq")
    val batch = ev(
      ("INSERT", 5L, "spark window five", 50L),
      ("UPDATE", 1L, "spark window one prime", 51L),
      ("DELETE", 2L, null, 52L))
    val docs = Seq(
      (1L, "spark window spark query"),
      (2L, "spark window window window")).toDF("doc_id", "text")

    val st = uniq("graft_cdc_replay_s_")
    val sp = (1 to 2).map(_ => tmp("graft_cdc_replay_s_"))
    try {
      SearchOps.writeSearchIndex(docs, "doc_id", "text", st, sp(0),
        numBuckets = 4)
      SearchOps.writeDocLengths(spark, st, sp(1), numBuckets = 4)
      IngestStream.applyCdcBatch(spark, st, batch, numBuckets = 4,
        batchId = 3L)
      val counts = (spark.table(st).count(),
        spark.table(s"${st}_pending").count(),
        spark.table(s"${st}_tombstones").count())
      IngestStream.applyCdcBatch(spark, st, batch, numBuckets = 4,
        batchId = 3L)
      assert((spark.table(st).count(),
        spark.table(s"${st}_pending").count(),
        spark.table(s"${st}_tombstones").count()) == counts,
        "replayed CDC batch re-applied a side effect (search sink)")
    } finally Seq(st, s"${st}_doclens", s"${st}_pending",
      s"${st}_tombstones", s"${st}_applied")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

    graft.functions.GraftFunctions.register(spark)
    val bt = uniq("graft_cdc_replay_b_")
    val bp = tmp("graft_cdc_replay_b_")
    try {
      graft.operators.Dedup.writeBandIndex(docs, "doc_id", "text", bt, bp,
        numBuckets = 4)
      IngestStream.applyCdcBandBatch(spark, bt, batch, numBuckets = 4,
        batchId = 3L)
      val counts = (spark.table(bt).count(),
        spark.table(s"${bt}_pending").count(),
        spark.table(s"${bt}_tombstones").count())
      IngestStream.applyCdcBandBatch(spark, bt, batch, numBuckets = 4,
        batchId = 3L)
      assert((spark.table(bt).count(),
        spark.table(s"${bt}_pending").count(),
        spark.table(s"${bt}_tombstones").count()) == counts,
        "replayed CDC batch re-applied a side effect (band sink)")
    } finally Seq(bt, s"${bt}_pending", s"${bt}_tombstones",
      s"${bt}_applied").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("replayed micro-batch is skipped whole by the cluster sink") {
    graft.functions.GraftFunctions.register(spark)
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (20L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val band = uniq("graft_cl_replay_b_")
    val labels = uniq("graft_cl_replay_l_")
    val path = tmp("graft_cl_replay_")
    try {
      graft.operators.Dedup.writeBandIndex(corpus, "doc_id", "text", band,
        path, numBuckets = 4)
      IngestStream.applyClusterBatch(spark, band, labels, batch,
        numBuckets = 4, threshold = 0.5, batchId = 0L)
      val got = spark.table(labels).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(10L -> 10L, 20L -> 10L),
        s"drained batch must fold into the assignment: $got")
      val bandRows = spark.table(band).count()
      // the replay: band append and label fold must BOTH skip
      IngestStream.applyClusterBatch(spark, band, labels, batch,
        numBuckets = 4, threshold = 0.5, batchId = 0L)
      assert(spark.table(band).count() == bandRows,
        "replayed cluster batch re-appended band rows")
      assert(spark.table(labels).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap == got,
        "replayed cluster batch changed the assignment")
    } finally Seq(band, labels, s"${labels}_applied")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("replayed micro-batch is skipped whole by the ledger (search + IVF)") {
    val table = uniq("graft_replay_search_")
    val paths = (1 to 2).map(_ => tmp("graft_replay_search_"))
    val docs = Seq((1L, "spark window alpha")).toDF("doc_id", "text")
    val batch = Seq((2L, "spark window beta")).toDF("doc_id", "text")
    try {
      SearchOps.writeSearchIndex(docs, "doc_id", "text", table, paths(0),
        numBuckets = 4)
      SearchOps.writeDocLengths(spark, table, paths(1), numBuckets = 4)
      IngestStream.applySearchBatch(spark, table, batch, "doc_id", "text", 4,
        batchId = 7L)
      val postings = spark.table(table).count()
      val norms = spark.table(s"${table}_doclens").count()
      // the replay: same batchId arrives again (checkpoint commit lost)
      IngestStream.applySearchBatch(spark, table, batch, "doc_id", "text", 4,
        batchId = 7L)
      assert(spark.table(table).count() == postings,
        "replayed batch re-appended postings")
      assert(spark.table(s"${table}_doclens").count() == norms,
        "replayed batch re-appended norms rows")
      // a genuinely NEW batch still lands
      IngestStream.applySearchBatch(spark, table,
        Seq((3L, "spark gamma")).toDF("doc_id", "text"), "doc_id", "text", 4,
        batchId = 8L)
      assert(spark.table(s"${table}_doclens").count() == norms + 1)
    } finally Seq(s"${table}_applied", s"${table}_doclens", table)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

    // warm-path replay checks are pure memory (VERDICT r12 #6): once a
    // batch is recorded, the ledger TABLE can disappear and the replay
    // guard still holds — proof the per-batch path takes no catalog hit
    val hwm = uniq("graft_hwm_search_")
    val hwmPaths = (1 to 2).map(_ => tmp("graft_hwm_search_"))
    try {
      SearchOps.writeSearchIndex(
        Seq((1L, "spark window alpha")).toDF("doc_id", "text"),
        "doc_id", "text", hwm, hwmPaths(0), numBuckets = 4)
      SearchOps.writeDocLengths(spark, hwm, hwmPaths(1), numBuckets = 4)
      IngestStream.applySearchBatch(spark, hwm,
        Seq((2L, "spark window beta")).toDF("doc_id", "text"),
        "doc_id", "text", 4, batchId = 11L)
      val norms = spark.table(s"${hwm}_doclens").count()
      spark.sql(s"DROP TABLE ${hwm}_applied") // catalog can no longer answer
      IngestStream.applySearchBatch(spark, hwm,
        Seq((2L, "spark window beta")).toDF("doc_id", "text"),
        "doc_id", "text", 4, batchId = 11L)
      assert(spark.table(s"${hwm}_doclens").count() == norms,
        "warm replay check must not depend on the ledger table")
    } finally Seq(s"${hwm}_applied", s"${hwm}_doclens", hwm)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

    graft.functions.GraftFunctions.register(spark)
    val ivf = uniq("graft_replay_ivf_")
    val ivfPath = tmp("graft_replay_ivf_")
    val vecs = (0L until 16L).map(i =>
      (i, Array.tabulate(4)(d => math.sin(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    try {
      VectorOps.writeIvfIndex(vecs, ivf, ivfPath, numCentroids = 2,
        trainIters = 1)
      val vbatch = vecs.filter(col("vec_id") < 2)
        .select((col("vec_id") + 900L).as("vec_id"), col("embedding"))
      IngestStream.applyIvfBatch(spark, ivf, vbatch, batchId = 3L)
      val n = spark.table(s"${ivf}_lists").count()
      IngestStream.applyIvfBatch(spark, ivf, vbatch, batchId = 3L)
      assert(spark.table(s"${ivf}_lists").count() == n,
        "replayed vector batch re-inserted rows")
      IngestStream.applyIvfBatch(spark, ivf, vbatch
        .select((col("vec_id") + 100L).as("vec_id"), col("embedding")),
        batchId = 4L)
      assert(spark.table(s"${ivf}_lists").count() == n + 2)
    } finally Seq(s"${ivf}_applied", s"${ivf}_cents", s"${ivf}_lists")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("replayed micro-batch is skipped whole by the IVF-PQ CDC sink") {
    graft.functions.GraftFunctions.register(spark)
    val t = uniq("graft_replay_ivfpq_")
    val path = tmp("graft_replay_ivfpq_")
    val vecs = (0L until 16L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    try {
      VectorOps.writeIvfPqIndex(vecs, t, path, numCentroids = 2,
        trainIters = 1, m = 2, ksub = 4, pqIters = 1, dim = 8)
      // a statement-shaped CDC batch: one INSERT, one DELETE, one UPDATE
      val batch = Seq(
        ("INSERT", 900L, Array.tabulate(8)(d => math.cos(d).toFloat), 1L),
        ("DELETE", 3L, null.asInstanceOf[Array[Float]], 2L),
        ("UPDATE", 5L, Array.tabulate(8)(d => math.cos(d + 1).toFloat), 3L))
        .toDF("statement", "vec_id", "embedding", "event_seq")
      IngestStream.applyCdcIvfPqBatch(spark, t, batch, batchId = 3L,
        m = 2, dim = 8)
      val codes = spark.table(s"${t}_codes").count()
      val tombs = spark.table(s"${t}_tombstones").count()
      val pending = spark.table(s"${t}_pending").count()
      // the replay: same batchId arrives again (checkpoint commit lost)
      IngestStream.applyCdcIvfPqBatch(spark, t, batch, batchId = 3L,
        m = 2, dim = 8)
      assert(spark.table(s"${t}_codes").count() == codes,
        "replayed batch re-appended code rows")
      assert(spark.table(s"${t}_tombstones").count() == tombs,
        "replayed batch re-appended tombstones")
      assert(spark.table(s"${t}_pending").count() == pending,
        "replayed batch re-queued pending rows")
      // a genuinely NEW batch still lands (m=2 codes per insert)
      IngestStream.applyCdcIvfPqBatch(spark, t,
        batch.filter(col("statement") === "INSERT")
          .select(col("statement"), (col("vec_id") + 1).as("vec_id"),
            col("embedding"), col("event_seq")),
        batchId = 4L, m = 2, dim = 8)
      assert(spark.table(s"${t}_codes").count() == codes + 2)
    } finally Seq(s"${t}_applied", s"${t}_cents", s"${t}_codebooks",
      s"${t}_codes", s"${t}_tombstones", s"${t}_pending")
      .foreach(tb => spark.sql(s"DROP TABLE IF EXISTS $tb"))
  }
}
