package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** The one event-time TTL discipline shared by every stateful stream
  * (CDC dedup, funnel, running stats): eviction driven by the stream's
  * OWN clock via `EventTimeTimeout` + `setTimeoutTimestamp`, so it is
  * deterministic and replay-safe (a `ProcessingTimeTimeout` would also
  * force a micro-batch every trigger forever — `shouldRunAnotherBatch`
  * is always true under wall-clock timeouts — which burns cluster time
  * on empty batches and makes `processAllAvailable` never return).
  * One definition so the three streams' horizon semantics cannot
  * drift. */
private[streaming] object EventTimeTtl {

  /** Interval string → milliseconds; month = 30 days, the same
    * convention `GroupState` uses. */
  def millis(ttl: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    iv.months * 2592000000L + iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** Arm the key's timeout at `max(watermark + 1, max(lastEvent,
    * watermark) + ttl)`: a key whose (late) data lands with the
    * watermark already past lastEvent+ttl still gets a FULL ttl of
    * retention from now — otherwise late keys would be evicted on the
    * next batch (ADVICE r2). The +1 keeps the timestamp strictly past
    * the watermark (Spark rejects ≤ watermark) even at ttl = 0. */
  def arm(state: GroupState[_], lastEventMs: Long, ttlMillis: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1,
        math.max(lastEventMs, state.getCurrentWatermarkMs()) + ttlMillis))
}
