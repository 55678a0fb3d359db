package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal binary-column queries (SURVEY §2.3). The binary payloads
  * are derived deterministically from `documents` (utf-8 text bytes);
  * oracle parity uses base64/octet_length, which DuckDB supports on
  * blobs. The decode stage itself is a stub (no codecs in-container) and
  * is covered rows-only + by MultimodalSpec. */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // binary column plumbing: opaque payload + typed metadata
    "mm_binary_meta" -> ((s, dir) => {
      Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .select(col("media_id"), col("media_type"),
          octet_length(col("media")).cast("long").as("n_bytes"),
          // Spark base64 is MIME-chunked (CRLF every 76 chars); strip for
          // canonical unchunked base64 (= DuckDB to_base64)
          regexp_replace(base64(col("media")), "[\\r\\n]", "").as("payload_b64"))
        .orderBy(col("media_id"))
    }),

    // frame-sampling shape: one blob → many fixed-size chunks
    "mm_frame_chunks" -> ((s, dir) => {
      Multimodal.sampleChunks(
          Multimodal.mediaFromDocuments(Tables.documents(s, dir)),
          chunkSize = 32, stride = 4)
        .orderBy(col("media_id"), col("chunk_idx"))
    }),

    // stubbed decode + feature extraction (mapPartitions batch shape);
    // every feature is an integer-exact function of the payload bytes,
    // so the full decode output is oracle-gated (byte math over the
    // hex-rendered blob on the DuckDB side)
    "mm_decode_features" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .as[Multimodal.MediaRow]
      Multimodal.decodeStub(media).toDF().orderBy(col("media_id"))
    }),

    // stubbed resize: blob in → bounded thumbnail blob out (every k-th
    // byte, k = ceil(n/64)); payload + byte-sum audit both oracle-gated
    "mm_resize_thumb" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, dir))
        .as[Multimodal.MediaRow]
      Multimodal.resizeStub(media, maxBytes = 64).toDF().orderBy(col("media_id"))
    }),

    // exact dedup over the BINARY payload (content-hash groupBy — the
    // media twin of dedup_exact), on the same injected-dup corpus
    "mm_dedup_binary" -> ((s, dir) => {
      graft.operators.Dedup.exactGroups(
          Multimodal.mediaFromDocuments(TextQueries.dupCorpus(Tables.documents(s, dir))),
          "media_id", "media")
        .orderBy(col("content_hash"))
    }),

    // the binaryFile SOURCE itself: a directory of media files read
    // whole-file (path/length/content), glob-pruned at listing time —
    // the ingestion edge the mm_* pipeline starts from. The fixture dir
    // is deterministic (same 64 ASCII files at every scale factor), so
    // the DuckDB read_blob mirror gates names, sizes, AND content bytes
    "mm_binary_source" -> ((s, dir) => {
      graft.sources.Sources.binaryFiles(s, binaryFixtureDir(), "*.bin")
        .select(
          regexp_extract(col("path"), "[^/]+$", 0).as("file_name"),
          col("length").as("n_bytes"),
          md5(col("content")).as("digest"))
        .orderBy(col("file_name"))
    }))

  /** Deterministic whole-file fixture for [[Sources.binaryFiles]]: 64
    * ASCII files under one fixed path, written once (write-if-missing —
    * re-runs and concurrent sessions produce byte-identical files, so
    * the race is harmless). Fixed content keeps the static oracle SQL
    * able to name the path. */
  private def binaryFixtureDir(): String = {
    val dir = java.nio.file.Paths.get("/tmp/graft_binary_source_fixture")
    java.nio.file.Files.createDirectories(dir)
    (0 until 64).foreach { i =>
      val f = dir.resolve(f"media_$i%02d.bin")
      if (!java.nio.file.Files.exists(f))
        java.nio.file.Files.write(f,
          (f"graft-binary-fixture-$i%02d:" * (i % 5 + 1))
            .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
    dir.toString
  }

  def oracle: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id AS media_id, 'fake/' || source AS media_type,
        |  octet_length(encode(text)) AS n_bytes,
        |  to_base64(encode(text)) AS payload_b64
        |FROM documents ORDER BY doc_id""".stripMargin,
    // chunking the text then encoding ≡ chunking the utf-8 blob (ASCII)
    "mm_frame_chunks" ->
      """SELECT doc_id AS media_id, i AS chunk_idx,
        |  to_base64(encode(substr(text, i * 128 + 1, 32))) AS chunk_b64
        |FROM documents,
        |  LATERAL unnest(range(0, ((octet_length(encode(text)) - 1) // 128) + 1)) AS t(i)
        |ORDER BY media_id, chunk_idx""".stripMargin,
    // byte features recomputed from the hex rendering of the blob
    // (DuckDB 1.0 cannot subscript a BLOB; hex pairs → byte values).
    // head_crc closed form: Σ b_i · 31^(m-i), m = min(8, n) — 31^k is
    // integer-exact in double for k ≤ 7, total ≤ 7.3e12 (fits BIGINT).
    "mm_decode_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 'fake/' || source AS media_type,
        |    hex(encode(text)) AS h, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT media_id, media_type, n::BIGINT AS n_bytes,
        |  ((n % 640) + 1)::INT AS fake_width,
        |  ((n % 480) + 1)::INT AS fake_height,
        |  coalesce(list_sum(list_transform(range(1, n + 1),
        |    i -> ('0x' || substr(h, 2*i - 1, 2))::BIGINT)), 0)::BIGINT AS byte_sum,
        |  coalesce(list_sum(list_transform(range(1, least(8, n) + 1),
        |    i -> ('0x' || substr(h, 2*i - 1, 2))::BIGINT
        |         * (31 ** (least(8, n) - i))::BIGINT)), 0)::BIGINT AS head_crc
        |FROM m ORDER BY media_id""".stripMargin,
    // the corpus is ASCII (mm_frame_chunks already relies on char ≡ byte),
    // so sampling every k-th CHAR of the text mirrors sampling every k-th
    // BYTE of the blob; byte sums via the same hex-pair trick
    "mm_resize_thumb" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
        |    octet_length(encode(text)) AS n FROM documents),
        |p AS (SELECT media_id, n, greatest(1, (n + 63) // 64) AS k, text FROM m),
        |s AS (SELECT media_id, n, k,
        |  array_to_string(list_transform(range(0, (n + k - 1) // k),
        |    i -> substr(text, CAST(i * k + 1 AS INT), 1)), '') AS thumb
        |  FROM p)
        |SELECT media_id, n::BIGINT AS n_bytes, k::INT AS stride,
        |  octet_length(encode(thumb))::BIGINT AS out_bytes,
        |  coalesce(list_sum(list_transform(range(1, octet_length(encode(thumb)) + 1),
        |    j -> ('0x' || substr(hex(encode(thumb)), CAST(2*j - 1 AS INT), 2))::BIGINT)), 0)::BIGINT
        |    AS out_byte_sum,
        |  to_base64(encode(thumb)) AS thumb_b64
        |FROM s ORDER BY media_id""".stripMargin,
    // DuckDB md5 is VARCHAR-only; md5(text) hashes the UTF-8 bytes,
    // which IS the blob (encode(text)) — same digest as Spark's
    // md5(binary)
    "mm_dedup_binary" ->
      s"""WITH ${TextQueries.corpusSql}
        |SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM corpus GROUP BY md5(text) ORDER BY content_hash""".stripMargin,
    // the fixture files are ASCII, so decode(blob) is lossless and
    // md5(decode(·)) is the byte digest Spark's md5(content) computes
    "mm_binary_source" ->
      """SELECT regexp_extract(filename, '[^/]+$') AS file_name,
        |  CAST(size AS BIGINT) AS n_bytes,
        |  md5(decode(content)) AS digest
        |FROM read_blob('/tmp/graft_binary_source_fixture/*.bin')
        |ORDER BY file_name""".stripMargin)
}
