package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observed event for the smoothing state machine. */
case class HoltObs(typ: String, tsUs: Long, cents: Long)

/** Per-type keyed state: the folded Holt pair (l, b) over CLOSED days,
  * the day still accumulating, a monotone emission sequence, and a
  * count of DROPPED late events — SIX longs per event type, the whole
  * state. */
case class HoltState(nFolded: Long, l: Long, b: Long,
    pendingDay: Long, pendingSum: Long, seq: Long, late: Long)

/** The state snapshot emitted after each micro-batch touches a type. */
case class HoltSnap(typ: String, nFolded: Long, l: Long, b: Long,
    pendingDay: Long, pendingSum: Long, seq: Long, late: Long)

/** Streaming Holt linear-trend smoothing — the stateful twin of the
  * batch `events_forecast_holt` array fold. The batch form folds the
  * completed day grid; the streaming form carries the (l, b) pair plus
  * the OPEN day's running sum per type, closing a day into the fold the
  * moment a later-day event arrives (α = β = 1/2, every update the
  * exact floor-halving `Math.floorDiv` — bit-identical to the batch
  * fold's portable floor-div). The still-open final day cannot fold
  * inside the stream (no later event ever arrives to close it); each
  * batch therefore emits the full state SNAPSHOT, and the finisher
  * applies that one deterministic closing step to the latest snapshot —
  * a types-bounded DataFrame expression, gated by the SAME oracle as
  * the batch entry (stream ≡ batch by construction).
  *
  * LATE-EVENT GUARD: an event whose day precedes the pending day
  * violates the time-ordered-waves contract; folding it would close
  * the pending day, re-open the OLD day, and double-fold on the next
  * in-order event — irreversible (l, b) corruption. Such rows are
  * DROPPED instead, and the snapshot carries a visible `late` counter
  * so the violation is observable rather than silent (a monitor can
  * alert on late > 0 and replay from the batch fold).
  *
  * 100 TB/continuous shape: state is O(types)·5 longs regardless of
  * event volume; each micro-batch shuffles only its own rows to the
  * type-keyed state partitions. Day boundaries may split across
  * batches freely — only event-TIME order matters (the suite's
  * time-ordered-waves fixture contract, shared with Markov/
  * attribution). NoTimeout: a series continues across quiet periods;
  * the state is types-bounded, so cardinality needs no TTL. */
object HoltStream {

  def levels(events: DataFrame): Dataset[HoltSnap] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type").as("typ"),
        expr("ts div 1000").as("tsUs"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[HoltObs]
      .groupByKey(_.typ)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (typ: String, rows: Iterator[HoltObs],
            state: GroupState[HoltState]) => {
          def fd2(x: Long) = Math.floorDiv(x, 2L)
          var st = state.getOption.orNull
          rows.toVector.sortBy(_.tsUs).foreach { r =>
            val day = Math.floorDiv(r.tsUs, 86400000000L)
            if (st == null) st = HoltState(0, 0, 0, day, r.cents, 0, 0)
            else if (day == st.pendingDay)
              st = st.copy(pendingSum = st.pendingSum + r.cents)
            else if (day < st.pendingDay)
              // contract violation: folding would re-open a closed day
              // and double-fold it later — drop, count, stay sane
              st = st.copy(late = st.late + 1)
            else {
              // a later day arrived: close the pending day into (l, b)
              val (nl, nb) =
                if (st.nFolded == 0) (st.pendingSum, 0L)
                else {
                  val lv = fd2(st.pendingSum + st.l + st.b)
                  (lv, fd2(st.b + lv - st.l))
                }
              st = HoltState(st.nFolded + 1, nl, nb, day, r.cents,
                st.seq, st.late)
            }
          }
          st = st.copy(seq = st.seq + 1)
          state.update(st)
          Iterator.single(HoltSnap(typ, st.nFolded, st.l, st.b,
            st.pendingDay, st.pendingSum, st.seq, st.late))
        })
  }
}
