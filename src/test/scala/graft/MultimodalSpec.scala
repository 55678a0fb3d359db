package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Deterministic checks of the multimodal plumbing: the real
  * javax.imageio decode/resize contracts (lossless roundtrip of the
  * analytic raster, hand-computed block averages, partition batching)
  * and the chunk sampler's coverage. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pngOf(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixels.length; val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixels(y)(x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages recovers the analytic raster exactly (PNG lossless roundtrip)") {
    val ids = Seq(0L, 5L, 62L) // covers odd and even dims
    val media = ids.map(id =>
      Multimodal.MediaRow(id, "image/png", Multimodal.encodeSyntheticPng(id))).toDS()
    val out = Multimodal.decodeImages(media).collect().map(f => f.media_id -> f).toMap
    for (id <- ids) {
      val (w, h) = Multimodal.imageDims(id)
      val f = out(id)
      assert(f.width == w && f.height == h && f.n_pixels == w.toLong * h)
      val expSum = (c: Int) => (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pixelValue(x, y, c, id).toLong).sum
      assert(f.sum_r == expSum(0) && f.sum_g == expSum(1) && f.sum_b == expSum(2))
      val lumas = for (y <- 0 until h; x <- 0 until w) yield
        (Multimodal.pixelValue(x, y, 0, id) + Multimodal.pixelValue(x, y, 1, id) +
          Multimodal.pixelValue(x, y, 2, id)) / 3 / 64
      assert(Seq(f.hist_0, f.hist_1, f.hist_2, f.hist_3) ==
        (0 to 3).map(b => lumas.count(_ == b).toLong))
    }
  }

  test("decodeImages on a hand-built PNG (independent of the synthetic generator)") {
    val px = Array(
      Array((255, 0, 0), (0, 255, 0)),
      Array((0, 0, 255), (10, 20, 30)))
    val media = Seq(Multimodal.MediaRow(7L, "image/png", pngOf(px))).toDS()
    val f = Multimodal.decodeImages(media).collect().head
    assert(f.width == 2 && f.height == 2 && f.n_pixels == 4)
    assert(f.sum_r == 265 && f.sum_g == 275 && f.sum_b == 285)
    // lumas: 85, 85, 85, 20 → buckets 1,1,1,0
    assert(f.hist_0 == 1 && f.hist_1 == 3 && f.hist_2 == 0 && f.hist_3 == 0)
  }

  test("resizeImages block-averages with floor division, edge blocks clipped") {
    // 3×3: odd dims → right column and bottom row are 1-wide/1-tall blocks
    val px = Array(
      Array((10, 0, 0), (20, 0, 0), (99, 1, 2)),
      Array((30, 0, 0), (41, 0, 0), (101, 3, 4)),
      Array((7, 5, 6), (9, 7, 8), (255, 255, 255)))
    val media = Seq(Multimodal.MediaRow(1L, "image/png", pngOf(px))).toDS()
    val t = Multimodal.resizeImages(media).collect().head
    assert(t.in_w == 3 && t.in_h == 3 && t.out_w == 2 && t.out_h == 2)
    // blocks: TL mean(10,20,30,41)=25 (floor 101/4); TR mean(99,101)=100;
    // BL mean(7,9)=8; BR 255
    assert(t.sum_r == 25 + 100 + 8 + 255)
    assert(t.sum_g == 0 + 2 + 6 + 255)
    assert(t.sum_b == 0 + 3 + 7 + 255)
    assert(t.reencode_ok, "thumbnail must re-encode to PNG and roundtrip pixel-exactly")
  }

  test("decodeImages runs partition-batched and scales with partitions") {
    val media = (1L to 100L)
      .map(i => Multimodal.MediaRow(i, "image/png", Multimodal.encodeSyntheticPng(i)))
      .toDS().repartition(8)
    val out = Multimodal.decodeImages(media)
    assert(out.rdd.getNumPartitions == 8, "decode must not collapse partitioning")
    assert(out.count() == 100)
  }

  test("aHash: flat image hashes to zero, hand-built split image to known bits") {
    // flat gray: every luma equals the mean → no bit is strictly greater
    val flat = Array.fill(8)(Array.fill(8)((100, 100, 100)))
    // top half dark (luma 10), bottom half bright (luma 200): mean 105,
    // bits set exactly for grid rows j >= 4 → hash_hi = 0, hash_lo = -1
    // as unsigned 32... compute explicitly: bits 32..63 set
    val split = Array.tabulate(8)(y => Array.fill(8)(
      if (y < 4) (10, 10, 10) else (200, 200, 200)))
    val media = Seq(
      Multimodal.MediaRow(1L, "image/png", pngOf(flat)),
      Multimodal.MediaRow(2L, "image/png", pngOf(split))).toDS()
    val out = Multimodal.aHash(media).collect().map(h => h.media_id -> h).toMap
    assert(out(1L).hash_hi == 0L && out(1L).hash_lo == 0L)
    assert(out(2L).hash_hi == 0L, "top half below mean → low 32 bits clear")
    assert(out(2L).hash_lo == 0xFFFFFFFFL,
      "bottom half above mean → bits 32..63 all set")
  }

  test("dupImages twins hash identically and pair in perceptual dedup") {
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val hashes = Multimodal.aHash(Multimodal.dupImages(docs))
      .collect().map(h => h.media_id -> (h.hash_hi, h.hash_lo)).toMap
    // every %10==3 doc has a twin at id+100000 with the SAME hash
    Seq(3L, 13L, 23L, 33L).foreach { id =>
      assert(hashes(id) == hashes(id + 100000L),
        s"twin of $id must hash identically")
    }
    assert(hashes.size == 44)
  }

  test("decodeAudio recovers the analytic waveform exactly (RIFF/PCM16LE roundtrip)") {
    val ids = Seq(0L, 5L, 136L, 137L) // covers min/max lengths + wrap
    val media = ids.map(id =>
      Multimodal.MediaRow(id, "audio/wav", Multimodal.encodeSyntheticWav(id))).toDS()
    val out = Multimodal.decodeAudio(media).collect().map(f => f.media_id -> f).toMap
    for (id <- ids) {
      val n = Multimodal.audioLen(id)
      val s = (0 until n).map(t => Multimodal.sampleValue(t, id).toLong)
      val f = out(id)
      assert(f.n_samples == n.toLong && f.sample_rate == 8000)
      assert(f.sum_samples == s.sum && f.sum_abs == s.map(math.abs).sum)
      assert(f.peak_abs == s.map(math.abs).max)
      assert(f.zero_crossings ==
        (1 until n).count(t => (s(t - 1) < 0) != (s(t) < 0)).toLong)
      assert(Seq(f.hist_0, f.hist_1, f.hist_2, f.hist_3) ==
        (0 to 3).map(b => s.count(v => (v + 32768) / 16384 == b).toLong))
    }
  }

  test("decodeAudio on a hand-built WAV (independent of the synthetic generator)") {
    // 4 frames: +1, -1, 0, -32768 — exercises sign, zero (non-negative),
    // and the most negative value's byte layout
    val vals = Seq[Short](1, -1, 0, -32768)
    val bb = java.nio.ByteBuffer.allocate(44 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(8)
    vals.foreach(bb.putShort)
    val media = Seq(Multimodal.MediaRow(9L, "audio/wav", bb.array())).toDS()
    val f = Multimodal.decodeAudio(media).collect().head
    assert(f.n_samples == 4 && f.sum_samples == -32768L)
    assert(f.sum_abs == 32770L && f.peak_abs == 32768L)
    // sign flips: +1 → -1 (flip), -1 → 0 (flip: 0 is non-negative),
    // 0 → -32768 (flip)
    assert(f.zero_crossings == 3L)
    // buckets of v+32768: 32769→2, 32767→1, 32768→2, 0→0
    assert(f.hist_0 == 1 && f.hist_1 == 1 && f.hist_2 == 2 && f.hist_3 == 0)
  }

  test("dupAudio twins hash identically; distinct clips mostly differ") {
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val hashes = Multimodal.audioHash(Multimodal.dupAudio(docs))
      .collect().map(h => h.media_id -> (h.hash_hi, h.hash_lo)).toMap
    Seq(3L, 13L, 23L, 33L).foreach { id =>
      assert(hashes(id) == hashes(id + 100000L),
        s"twin of $id must hash identically")
    }
    assert(hashes.size == 44)
    // the id-dependent slope keeps the hash discriminative (a pure
    // linear ramp would collapse every clip to one bit pattern)
    assert(hashes.values.toSet.size >= 35,
      s"audio hash must separate distinct clips, got ${hashes.values.toSet.size} distinct")
  }

  test("imageSignals/audioSignals equal the separate decode passes") {
    val docs = (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val imgs = Multimodal.syntheticImages(docs)
    val sig = Multimodal.imageSignals(imgs).collect().map(s => s.media_id -> s).toMap
    val feats = Multimodal.decodeImages(imgs).collect().map(f => f.media_id -> f).toMap
    val hashes = Multimodal.aHash(imgs).collect().map(h => h.media_id -> h).toMap
    (0L until 30L).foreach { id =>
      assert(sig(id).n_pixels == feats(id).n_pixels)
      assert(sig(id).mid_count == feats(id).hist_1 + feats(id).hist_2)
      assert(sig(id).hash_hi == hashes(id).hash_hi &&
        sig(id).hash_lo == hashes(id).hash_lo)
    }
    val auds = Multimodal.syntheticAudio(docs)
    val asig = Multimodal.audioSignals(auds).collect().map(s => s.media_id -> s).toMap
    val afeats = Multimodal.decodeAudio(auds).collect().map(f => f.media_id -> f).toMap
    val ahashes = Multimodal.audioHash(auds).collect().map(h => h.media_id -> h).toMap
    (0L until 30L).foreach { id =>
      assert(asig(id).zero_crossings == afeats(id).zero_crossings)
      assert(asig(id).hash_hi == ahashes(id).hash_hi &&
        asig(id).hash_lo == ahashes(id).hash_lo)
    }
  }

  test("capstone plans decode each modality exactly once (plan pin)") {
    // each modality leg is encode-mapPartitions + signals-mapPartitions;
    // a groupBy-self-join survivor (or separate feature/hash passes)
    // re-runs the decode lineage per plan REFERENCE — this pins the
    // shared-decode rewrite (3 decode passes → 1 per modality)
    def mapPartitionCount(name: String): Int =
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan.collect {
          case p if p.getClass.getSimpleName == "MapPartitions" => p
        }.size
    assert(mapPartitionCount("mm_curation_capstone") == 2,
      "image capstone: 1 encode + 1 signals pass")
    assert(mapPartitionCount("mm_trimodal_capstone") == 4,
      "tri-modal: (encode + signals) × 2 modalities")
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
