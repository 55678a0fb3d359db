package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators (SURVEY §2.3): image/audio/video payloads
  * are opaque `binary` columns with typed metadata, processed in
  * partition-sized batches.
  *
  * The decode step is a STUB by design — this container has no image/
  * audio codecs — but everything Spark-side is real: the schema, the
  * binary column handling, the partition-batched processing shape
  * (`mapPartitions` over an iterator = the same batch contract a Pandas
  * UDF / `mapInPandas` has in PySpark), and the deterministic tests.
  * Swapping [[decodeStub]] for a real codec changes no plumbing.
  *
  * 100 TB notes: media blobs dominate row size, so operators here always
  * prune to (id, media) before the heavy stage, keep work narrow (no
  * shuffle), and emit compact features — the pattern that keeps a media
  * pipeline scan-bound instead of shuffle-bound.
  */
object Multimodal {

  /** A typed media row: what a real ingest would carry. */
  case class MediaRow(media_id: Long, media_type: String, media: Array[Byte])

  /** Extracted features (deterministic fake of an image decoder's output).
    * All fields are integer-exact functions of the payload bytes so the
    * whole decode output is oracle-gatable (VERDICT r1 #4): `byte_sum`
    * instead of a float mean (no cross-engine rounding), `head_crc` a
    * base-31 rolling hash of the FIRST 8 bytes (≤ 255·Σ31^i ≈ 7.3e12 —
    * fits BIGINT exactly on both engines). */
  case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Long,
      fake_width: Int, fake_height: Int, byte_sum: Long, head_crc: Long)

  /** Testdata has no binary table; derive one deterministically from
    * `documents` (text bytes as the opaque payload). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("fake/"), col("source")).as("media_type"),
      encode(col("text"), "utf-8").as("media"))

  /** STUB decoder ??? — stands in for e.g. JPEG decode + resize. It is a
    * pure function of the bytes (deterministic, oracle-checked): fake
    * "dimensions" from the length, "pixel energy" as the byte sum, a
    * base-31 rolling hash of the 8-byte head. Runs per partition over an
    * iterator, the exact shape a vectorized decode batch would use. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.media
        val n = bytes.length
        var crc = 0L
        var i = 0
        while (i < math.min(8, n)) { crc = crc * 31 + (bytes(i) & 0xff); i += 1 }
        var s = 0L; var j = 0
        while (j < n) { s += (bytes(j) & 0xff); j += 1 }
        MediaFeatures(r.media_id, r.media_type, n.toLong,
          fake_width = (n % 640) + 1, fake_height = (n % 480) + 1,
          byte_sum = s, head_crc = crc)
      }
    }
  }

  /** Thumbnail output of [[resizeStub]]: the downsampled payload plus
    * integer-exact audit features (same oracle-gating discipline as
    * [[MediaFeatures]]). */
  case class MediaThumb(media_id: Long, n_bytes: Long, stride: Int,
      out_bytes: Long, out_byte_sum: Long, thumb_b64: String)

  /** STUB resize ??? — stands in for image downscaling. A real resize
    * resamples pixels; this deterministic fake keeps every `k`-th byte
    * with `k = ceil(n / maxBytes)`, so the output payload is bounded at
    * `maxBytes` regardless of input size — the blob-in → smaller-blob-out
    * shape (and the row-size reduction) of a real thumbnail stage, with
    * the same partition-batched iterator contract as [[decodeStub]]. */
  def resizeStub(media: Dataset[MediaRow], maxBytes: Int = 64): Dataset[MediaThumb] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.media
        val n = bytes.length
        val k = math.max(1, (n + maxBytes - 1) / maxBytes)
        val out = Array.newBuilder[Byte]
        var i = 0
        while (i < n) { out += bytes(i); i += k }
        val thumb = out.result()
        var s = 0L; var j = 0
        while (j < thumb.length) { s += (thumb(j) & 0xff); j += 1 }
        MediaThumb(r.media_id, n.toLong, k, thumb.length.toLong, s,
          java.util.Base64.getEncoder.encodeToString(thumb))
      }
    }
  }

  /** Frame-sampling analog: every `stride`-th fixed-size chunk of the
    * blob (video frame extraction shape: one input row → many chunk
    * rows). Pure built-ins: posexplode over computed offsets, substring
    * on the binary column. */
  def sampleChunks(df: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    val nChunks = floor((octet_length(col("media")) - 1) / lit(chunkSize * stride)) + 1
    // sequence(0, -1) DESCENDS ([0, -1]) rather than being empty — an
    // empty blob must yield zero chunk rows (explode of empty array)
    val idxs = when(octet_length(col("media")) > 0,
      sequence(lit(0), nChunks.cast("int") - 1)).otherwise(array().cast("array<int>"))
    df.select(col("media_id"), explode(idxs).as("chunk_idx"), col("media"))
      .select(col("media_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        base64(col("media").substr(
          col("chunk_idx") * (chunkSize * stride) + 1, lit(chunkSize))).as("chunk_b64"))
  }
}
