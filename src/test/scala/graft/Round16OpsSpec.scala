package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CdcOps, EventOps, ScaleOps, TextOps}

/** Gates for the r16 ADVICE fixes: the NULL-cursor keyset contract,
  * the zValue 16-bit loud-failure guard, and the ewmaScaled taps
  * bound. */
class Round16OpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("drainKeyset: NULL/empty cursor restarts from the head") {
    val q = (1L to 6L).map(i => (i, i % 2 == 1)).toDF("id", "processed")
    // empty cursor frame -> max(id) over zero rows = NULL -> first page
    val emptyCursor = q.filter(col("id") > 100)
      .agg(max(col("id")).as("cursor"))
    val p1 = CdcOps.drainKeyset(q, emptyCursor, 2)
      .collect().map(_.getLong(0)).sorted
    assert(p1.toSeq == Seq(2L, 4L))
  }

  test("zValue: in-domain interleave unchanged, out-of-domain fails loudly") {
    val ok = Seq((3L, 5L)).toDF("a", "b")
      .select(ScaleOps.zValue(col("a"), col("b")).as("z"))
      .collect().head.getLong(0)
    // 3 = 0b011, 5 = 0b101 -> interleave(a even bits, b odd bits):
    // a bits at even positions: 1,1,0 -> 0b000101; b at odd: 1,0,1 ->
    // 0b100010 -> z = 0b100111 = 39
    assert(ok == 39L)
    val bad = Seq((70000L, 1L)).toDF("a", "b")
      .select(ScaleOps.zValue(col("a"), col("b")).as("z"))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage.contains("zValue") ||
      e.getCause != null && e.getCause.getMessage.contains("zValue"))
  }

  test("shardManifest: two-level prefix sum equals the global cumsum") {
    // sizes 10,20,30,40,50,60 over ids 1..6; shard size 60 ->
    // start offsets 0,10,30,60,100,150 -> shards 0,0,0,1,1,2
    val df = (1L to 6L).map(i => (i, i * 10L)).toDF("doc_id", "n_chars")
    val m = graft.operators.PipelineOps
      .shardManifest(df, "doc_id", col("n_chars"), shardChars = 60L,
        rangeSize = 2L)
      .orderBy(col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(m.toSeq == Seq((0L, 3L, 60L, 1L, 3L), (1L, 2L, 90L, 4L, 5L),
      (2L, 1L, 60L, 6L, 6L)))
  }

  test("mutualKnnEdges keeps only bidirectional pairs, canonical a<b") {
    val knn = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val m = graft.operators.GraphOps.mutualKnnEdges(knn)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(m.toSeq == Seq((1L, 2L), (3L, 4L)))
  }

  test("labelPropagationOver: isolated nodes keep their own label") {
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("node")
    val edges = Seq((2L, 3L)).toDF("src", "dst")
    val lab = graft.operators.GraphOps
      .labelPropagationOver(nodes, edges, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(lab.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 2L), (9L, 9L)))
  }

  test("rakeKeyphrases: hand-computed degree/freq scores on a toy corpus") {
    // stopwords include "the","of". Doc: "deep learning of the deep net"
    // phrases: ["deep learning"], ["deep net"]
    // freq(deep)=2 degree(deep)=4 -> 2_000_000; learning: 1/2 -> 2_000_000;
    // net: 1/2 -> 2_000_000. "deep learning" = 4_000_000, "deep net" same.
    val docs = Seq((1L, "deep learning of the deep net"))
      .toDF("doc_id", "text")
    val out = TextOps.rakeKeyphrases(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(("deep learning", 1L, 4000000L),
      ("deep net", 1L, 4000000L)))
  }

  test("ewmaScaled: taps outside [1, 44] fails at plan time") {
    val ev = Seq((1L, "a", 1L, 1.0)).toDF("event_id", "event_type", "ts_us", "value")
    intercept[IllegalArgumentException] { EventOps.ewmaScaled(ev, taps = 0) }
    intercept[IllegalArgumentException] { EventOps.ewmaScaled(ev, taps = 45) }
  }
}
