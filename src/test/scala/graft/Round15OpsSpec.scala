package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CdcOps, GraphOps, TextOps}

/** Hand-computed gates for the r15 late-wave operators: keyset
  * pagination, label-propagation components, tf·idf weights, and the
  * value-domain ε-band pair count.
  */
class Round15OpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("drainKeyset: page 2 starts after page 1's cursor, skips processed") {
    // ids 1..10, odd ids processed -> unprocessed 2,4,6,8,10
    val q = (1L to 10L).map(i => (i, i % 2 == 1)).toDF("id", "processed")
    val cursor = CdcOps.drainPage(q, 2).agg(max(col("id")).as("cursor"))
    // page 1 = {2,4} -> cursor 4; page 2 = {6,8}
    val p2 = CdcOps.drainKeyset(q, cursor, 2)
      .collect().map(_.getLong(0)).sorted
    assert(p2.toSeq == Seq(6L, 8L))
  }

  test("drainKeyset pages tile the queue with no overlap and no gap") {
    val q = (1L to 9L).map(i => (i, false)).toDF("id", "processed")
    val c1 = CdcOps.drainPage(q, 4).agg(max(col("id")).as("cursor"))
    val p2 = CdcOps.drainKeyset(q, c1, 4)
    val c2 = p2.agg(max(col("id")).as("cursor"))
    val p3 = CdcOps.drainKeyset(q, c2, 4)
    val all = CdcOps.drainPage(q, 4).select("id")
      .unionAll(p2.select("id")).unionAll(p3.select("id"))
      .collect().map(_.getLong(0)).sorted
    assert(all.toSeq == (1L to 9L))
  }

  test("labelPropagation: two components converge to their min labels") {
    // backbone fixture via lineitem shape is heavyweight; drive the
    // same round arithmetic by hand on the sf0.001 backbone instead:
    // after enough rounds every label must be a component minimum —
    // i.e. propagating ONE more round changes nothing once converged
    val k4 = GraphOps.labelPropagation(spark, "/root/testdata/sf0.001", 4)
    val k5 = GraphOps.labelPropagation(spark, "/root/testdata/sf0.001", 5)
    val m4 = k4.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m5 = k5.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m4.keySet == m5.keySet)
    // labels never increase round-over-round
    assert(m4.keySet.forall(n => m5(n) <= m4(n)))
    // every label is itself a node of the graph (min-propagation
    // invariant: labels are node ids, never invented values)
    assert(m4.values.toSet.subsetOf(m4.keySet))
  }

  test("tfidfWeights: hand-computed tf, idf prune, and integer weight") {
    // 4 docs; "common" in all 4 (df=4), "rare" in 1 (df=1, tf=2)
    val docs = Seq(
      (1L, "common rare rare"), (2L, "common x"),
      (3L, "common y"), (4L, "common z")).toDF("doc_id", "text")
    // maxDfPct=75 drops "common" (df 4 > 3); keeps rare/x/y/z (df 1)
    val w = TextOps.tfidfWeights(docs, "doc_id", "text", maxDfPct = 75)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(!w.keySet.exists(_._2 == "common"))
    // wq(rare) = tf 2 * floor(1e6 * ln(4/1)) = 2 * 1386294
    assert(w((1L, "rare")) == 2L * 1386294L)
    assert(w((2L, "x")) == 1386294L)
  }

  test("JaroWinklerSim: textbook values and the boost threshold") {
    import graft.functions.JaroWinklerSim
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double = {
      val e = JaroWinklerSim(null, null)
      e.score(UTF8String.fromString(a), UTF8String.fromString(b))
    }
    // Winkler's classic pair: jaro 0.944..., prefix 3 -> 0.961111...
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    // DWAYNE/DUANE: jaro 0.82, prefix 1 -> 0.84
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    // jaro 2/3 <= 0.7: the boost threshold suppresses the prefix bonus
    // (pinned to DuckDB: jaro_winkler_similarity returns plain jaro)
    assert(math.abs(jw("abcdwxyz", "abcdmnop") - 2.0 / 3.0) < 1e-12)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "x") == 0.0)
  }

  test("downsampleAudio: pair averages, odd tail dropped, halved rate") {
    import graft.operators.Multimodal
    // 5 samples -> 2 output frames; unsigned pair-average floors
    val wav = Multimodal.encodeWavPcm16(Array(100, 201, -50, -51, 9999), 8000)
    val ds = spark.createDataset(
      Seq(Multimodal.MediaRow(7L, "audio/wav", wav)))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val r = Multimodal.downsampleAudio(ds).collect().head
    assert(r.n_in == 5L && r.n_out == 2L && r.sample_rate == 4000)
    // (100+201)/2 in unsigned = 150 (floor), (-50 + -51) -> -51 (floor)
    assert(r.sum_out == 150L - 51L)
    assert(r.peak_abs_out == 150L)
    assert(r.roundtrip_ok)
  }

  test("applyScd2Batch: versions close/open correctly and replays are no-ops") {
    import graft.streaming.IngestStream
    val base = "graft_scd2_spec_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // empty dimension
    Seq.empty[(Long, Long, String, Long, Long, Option[Long], Boolean)]
      .toDF("o_orderkey", "version", "status", "price_cents",
        "valid_from", "valid_to", "is_current")
      .write.format("parquet").saveAsTable(s"${base}_g0")
    def batch(rows: (Long, Long, String, String, Long, Long)*) =
      rows.toDF("o_orderkey", "seq", "op", "status", "price_cents", "ts")
    try {
      // wave 1: insert keys 1, 2
      IngestStream.applyScd2Batch(spark, base,
        batch((1L, 1L, "I", "O", 100L, 10L), (2L, 1L, "I", "O", 200L, 20L)), 0L)
      // wave 2: update key 1, delete key 2
      IngestStream.applyScd2Batch(spark, base,
        batch((1L, 2L, "U", "X", 150L, 30L), (2L, 2L, "D", null.asInstanceOf[String], 0L, 40L)), 1L)
      // REPLAY of wave 2 (at-least-once delivery) must be a no-op
      IngestStream.applyScd2Batch(spark, base,
        batch((1L, 2L, "U", "X", 150L, 30L), (2L, 2L, "D", null.asInstanceOf[String], 0L, 40L)), 1L)
      val cur = spark.table(IngestStream.matviewCurrent(spark, base))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(5)) -1L else r.getLong(5), r.getBoolean(6))).toSet
      // key 1: v1 closed at 30, v2 open; key 2: v1 closed at 40, gone
      assert(cur == Set((1L, 1L, 30L, false), (1L, 2L, -1L, true),
        (2L, 1L, 40L, false)))
      // exactly two generations applied (the replay created none)
      assert(IngestStream.matviewCurrent(spark, base) == s"${base}_g2")
    } finally {
      (0 to 2).foreach(g =>
        spark.sql(s"DROP TABLE IF EXISTS ${base}_g$g"))
      spark.sql(s"DROP TABLE IF EXISTS ${base}_applied")
    }
  }

  test("value-domain band-join arithmetic: C(c,2) + cross products") {
    // same-type values: 10 x3, 40 x2, 100 x1 with eps=50:
    // same-value pairs C(3,2)+C(2,2) = 3+1 = 4
    // cross pairs |10-40|=30 <= 50 -> 3*2=6 ; 40..100 gap 60 excluded
    val e = Seq(10L, 10L, 10L, 40L, 40L, 100L).map(("t", _))
      .toDF("event_type", "cents")
    val v = e.groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("c"))
    val same = v.filter(col("c") >= 2)
      .select(expr("c * (c - 1) div 2").as("n")).collect().map(_.getLong(0)).sum
    assert(same == 4L)
    val a = v.select(col("cents"), col("c"))
    val b = v.select(col("cents").as("c2v"), col("c").as("c2"))
    val cross = a.join(b, col("c2v") > col("cents") && col("c2v") - col("cents") <= 50)
      .select((col("c") * col("c2")).as("n")).collect().map(_.getLong(0)).sum
    assert(cross == 6L)
  }
}
