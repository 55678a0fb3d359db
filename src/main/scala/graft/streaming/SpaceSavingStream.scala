package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observed event for the heavy-hitter sketch. */
case class SsObs(typ: String, user: Long)

/** Per-type keyed state: the Space-Saving counter table — AT MOST `k`
  * (item → count, item → max-overestimate) entries, the whole state. */
case class SsState(counts: Map[Long, Long], errs: Map[Long, Long],
    seq: Long)

/** One sketch counter snapshot emitted after a micro-batch. */
case class SsSnap(typ: String, user: Long, n: Long, err: Long, seq: Long)

/** STREAMING HEAVY HITTERS by the Space-Saving sketch (Metwally,
  * Agrawal & El Abbadi, ICDT 2005): per event type, track the most
  * frequent users in AT MOST `k` counters — when a new item arrives
  * with the table full, it REPLACES the minimum counter and inherits
  * its count (err records the inherited overestimate). Guarantees:
  * every item with true count > N/k is in the table, and every
  * reported count overestimates by at most its err ≤ N/k. This is the
  * bounded-memory complement of the batch `agg_count_min` sketch — the
  * state that answers "top users right now" on an unbounded stream
  * without ever holding per-user counts.
  *
  * Determinism: the eviction victim is the (count, item)-minimal
  * counter — a total order, so the sketch is replay-stable and
  * mirrorable. The GATED entry runs in the EXACT regime (k = 4096 ≥
  * the fixture's per-type user cardinality: no eviction ever fires,
  * every err = 0, counts are exact — the oracle is the plain exact
  * top-10). The approximate regime (k below cardinality) is
  * spec-pinned instead: overestimates bounded by err, true heavy
  * hitters never evicted. At 100 TB the same operator runs with k ≪
  * users and answers within the N/k bound.
  *
  * 100 TB/continuous shape: state is O(types·k) regardless of event
  * volume or user cardinality — that bound is the whole point of the
  * algorithm; each batch emits its counter table (types·k rows), and
  * the finisher ranks the LATEST snapshot. NoTimeout: the sketch is
  * the live answer forever; its size never grows past k. */
object SpaceSavingStream {

  def heavyHitters(events: DataFrame, k: Int): Dataset[SsSnap] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type").as("typ"),
        col("user_id").cast("long").as("user"))
      .as[SsObs]
      .groupByKey(_.typ)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (typ: String, rows: Iterator[SsObs],
            state: GroupState[SsState]) => {
          var counts = state.getOption.map(_.counts)
            .getOrElse(Map.empty[Long, Long])
          var errs = state.getOption.map(_.errs)
            .getOrElse(Map.empty[Long, Long])
          val seq = state.getOption.map(_.seq).getOrElse(0L) + 1
          rows.foreach { r =>
            counts.get(r.user) match {
              case Some(c) => counts = counts.updated(r.user, c + 1)
              case None if counts.size < k =>
                counts += (r.user -> 1L); errs += (r.user -> 0L)
              case None =>
                // replace the (count, item)-minimal counter; the new
                // item inherits its count as the overestimate bound
                val (mu, mc) = counts.minBy { case (u, c) => (c, u) }
                counts = counts - mu + (r.user -> (mc + 1))
                errs = errs - mu + (r.user -> mc)
            }
          }
          state.update(SsState(counts, errs, seq))
          counts.iterator.map { case (u, c) =>
            SsSnap(typ, u, c, errs(u), seq)
          }.toVector.iterator
        })
  }
}
