package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CdcOps, EventOps, ScaleOps}

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

  test("ewmaScaled: taps outside [1, 44] fails at plan time") {
    val ev = Seq((1L, "a", 1L, 1.0)).toDF("event_id", "event_type", "ts_us", "value")
    intercept[IllegalArgumentException] { EventOps.ewmaScaled(ev, taps = 0) }
    intercept[IllegalArgumentException] { EventOps.ewmaScaled(ev, taps = 45) }
  }
}
