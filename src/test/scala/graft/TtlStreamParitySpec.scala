package graft

import org.scalatest.funsuite.AnyFunSuite

/** Self-oracle for the TTL-path streaming entries (VERDICT r10 #5): the
  * `stream_funnel_ttl` / `stream_anomaly_ttl` queries run the
  * EventTimeTimeout machinery (watermark on the unfiltered input,
  * per-batch arm, expiry handler) with horizons chosen so that on the
  * driver fixture nothing is late and nobody is evicted — which makes
  * their output DEFINED to equal the NoTimeout twins':
  *  - funnel state converges order-independently, so the max-n_seen
  *    final rows must match exactly;
  *  - the anomaly stream's flags depend on the micro-batch
  *    decomposition, which is identical by construction (same epoch
  *    file dir, same one-file-per-trigger source), so parity is row
  *    for row including `prior_n`.
  * Eviction and post-expiry restart semantics — the paths a wide TTL
  * cannot reach — are pinned by FunnelStreamSpec and StatsStreamSpec
  * on purpose-built fixtures. */
class TtlStreamParitySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq.map(_.toSeq)

  test("stream_funnel_ttl == stream_funnel: converged reach per user") {
    val plain = rows("stream_funnel")
    val ttl = rows("stream_funnel_ttl")
    assert(plain.nonEmpty, "funnel stream emitted nothing")
    assert(ttl == plain,
      s"TTL funnel diverged from the NoTimeout twin: ttl=${ttl.take(5)} " +
        s"plain=${plain.take(5)}")
  }

  test("stream_anomaly_ttl == stream_anomaly: flags and prior_n row for row") {
    val plain = rows("stream_anomaly")
    val ttl = rows("stream_anomaly_ttl")
    assert(plain.nonEmpty, "anomaly stream emitted nothing")
    assert(ttl == plain,
      s"TTL anomaly stream diverged: ttl=${ttl.take(5)} plain=${plain.take(5)}")
  }

  test("stream_attribution_ttl == stream_attribution: converged credit report") {
    val plain = rows("stream_attribution")
    val ttl = rows("stream_attribution_ttl")
    assert(plain.nonEmpty, "attribution stream emitted nothing")
    assert(ttl == plain,
      s"TTL attribution diverged: ttl=${ttl.take(5)} plain=${plain.take(5)}")
  }
}
