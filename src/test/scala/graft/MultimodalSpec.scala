package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Deterministic checks of the multimodal plumbing: the stub decoder's
  * contract (pure function of bytes, partition-batched) and the chunk
  * sampler's coverage. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("decodeStub is a pure function of the bytes with the documented formulas") {
    val media = Seq(
      Multimodal.MediaRow(1L, "fake/img", "abc".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "fake/img", Array.empty[Byte]))
      .toDS()
    val out = Multimodal.decodeStub(media).collect().sortBy(_.media_id)
    val a = out(0)
    assert(a.n_bytes == 3)
    assert(a.fake_width == 4 && a.fake_height == 4)
    assert(a.byte_sum == ('a' + 'b' + 'c').toLong)
    assert(a.head_crc == (('a' * 31 + 'b') * 31 + 'c'))
    val e = out(1)
    assert(e.n_bytes == 0 && e.byte_sum == 0L && e.head_crc == 0L)
  }

  test("resizeStub bounds the payload at maxBytes and samples every k-th byte") {
    val big = (0 until 200).map(i => ('a' + i % 26).toChar).mkString
    val media = Seq(
      Multimodal.MediaRow(1L, "fake/img", big.getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "fake/img", "xy".getBytes("UTF-8")),
      Multimodal.MediaRow(3L, "fake/img", Array.empty[Byte]))
      .toDS()
    val out = Multimodal.resizeStub(media, maxBytes = 64).collect()
      .map(t => t.media_id -> t).toMap
    val t1 = out(1L)
    assert(t1.stride == math.ceil(200.0 / 64).toInt)
    assert(t1.out_bytes <= 64, "thumbnail must be bounded")
    val expect = big.getBytes("UTF-8").indices.by(t1.stride).map(big.charAt)
    assert(new String(java.util.Base64.getDecoder.decode(t1.thumb_b64)) ==
      expect.mkString)
    assert(t1.out_byte_sum == expect.map(_.toLong).sum)
    // small blob: stride 1, identity payload
    assert(out(2L).stride == 1 && out(2L).thumb_b64 ==
      java.util.Base64.getEncoder.encodeToString("xy".getBytes))
    // empty blob: empty thumbnail, zero sums
    assert(out(3L).out_bytes == 0L && out(3L).out_byte_sum == 0L
      && out(3L).thumb_b64 == "")
  }

  test("decodeStub runs partition-batched and scales with partitions") {
    val media = (1L to 100L)
      .map(i => Multimodal.MediaRow(i, "fake/img", s"payload-$i".getBytes))
      .toDS().repartition(8)
    val out = Multimodal.decodeStub(media)
    assert(out.rdd.getNumPartitions == 8, "decode must not collapse partitioning")
    assert(out.count() == 100)
  }

  test("sampleChunks covers the blob with stride and fixed chunk size") {
    val df = Seq((1L, ("x" * 270).getBytes("UTF-8"))).toDF("media_id", "media")
    val chunks = Multimodal.sampleChunks(df, chunkSize = 32, stride = 4)
      .orderBy("chunk_idx").collect()
    // 270 bytes, stride window 128 → chunks at offsets 0, 128, 256
    assert(chunks.length == 3)
    assert(chunks.map(_.getAs[Long]("chunk_idx")).toSeq == Seq(0L, 1L, 2L))
    val full = new String(java.util.Base64.getDecoder.decode(chunks(1).getAs[String]("chunk_b64")))
    assert(full.length == 32, "mid chunk is full size")
    val last = new String(java.util.Base64.getDecoder.decode(chunks(2).getAs[String]("chunk_b64")))
    assert(last.length == 270 - 256, "tail chunk is truncated, not padded")
    // empty blob → zero chunk rows (sequence(0,-1) would descend!)
    val empty = Seq((2L, Array.empty[Byte])).toDF("media_id", "media")
    assert(Multimodal.sampleChunks(empty, 32, 4).count() == 0)
  }
}
