package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming z-score anomaly flagging with RUNNING per-key statistics —
  * the continuous twin of [[graft.operators.EventOps.zscoreFlags]].
  * Each micro-batch's events are judged against the statistics of all
  * PRIOR batches (state as of batch start), then the state absorbs the
  * batch. Judging within-batch rows against a mid-batch state would make
  * flags depend on row iteration order; the batch-boundary contract
  * keeps them deterministic given the micro-batch decomposition.
  *
  * State per key is three longs (n, Σcents, Σcents²) — integer-exact
  * like the batch operator, so mean/σ are bit-deterministic — and its
  * size is bounded by key cardinality alone, never by stream length
  * (the 100 TB-stream requirement). Keys with fewer than 2 prior
  * observations flag nothing (no meaningful σ yet).
  *
  * Shape: one shuffle of each micro-batch on the key; state lives in the
  * state store (checkpointable, recoverable). `flatMapGroupsWithState`
  * buffers one (key, micro-batch) group at a time — bounded by the
  * per-key batch slice, not the stream. */
object StatsStream {

  case class Obs(key: String, id: Long, cents: Long)
  case class KeyStats(n: Long, s: Long, s2: Long)
  case class Flagged(key: String, id: Long, cents: Long, prior_n: Long,
    is_anom: Boolean)

  /** The flagging rule shared with the spec's replay oracle: judge
    * `cents` against prior stats (n, s, s2) at threshold `z`σ. */
  def judge(st: KeyStats, cents: Long, z: Double): Boolean =
    st.n >= 2 && {
      val mean = st.s.toDouble / st.n
      val variance = st.s2.toDouble / st.n - mean * mean
      math.abs(cents - mean) > z * math.sqrt(math.max(variance, 0.0))
    }

  def runningZscoreFlags(events: DataFrame, keyCol: String, idCol: String,
      centsCol: Column, z: Double): Dataset[Flagged] = {
    val spark = events.sparkSession
    import spark.implicits._
    val obs = events.select(col(keyCol).cast("string").as("key"),
      col(idCol).cast("long").as("id"), centsCol.cast("long").as("cents")).as[Obs]
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[Obs], state: GroupState[KeyStats]) => {
          val st = state.getOption.getOrElse(KeyStats(0L, 0L, 0L))
          val batch = rows.toVector
          val out = batch.map(o => Flagged(key, o.id, o.cents, st.n, judge(st, o.cents, z)))
          state.update(KeyStats(st.n + batch.size,
            st.s + batch.iterator.map(_.cents).sum,
            st.s2 + batch.iterator.map(o => o.cents * o.cents).sum))
          out.iterator
        })
  }

  // not `private`: the Dataset encoder's generated SafeProjection needs
  // bytecode access to the case class
  case class ObsT(key: String, id: Long, cents: Long, ets: java.sql.Timestamp)

  /** [[runningZscoreFlags]] with an event-time TTL ([[EventTimeTtl]]'s
    * shared horizon): a key idle for `ttl` of event time past the
    * watermark has its stats evicted. The per-key state is only 3
    * longs, so the bound this buys is on KEY CARDINALITY — per-user or
    * per-entity keys on an unbounded stream accrete keys forever
    * without it (per-type keys like the gated query's don't need it).
    * Expiry semantics are honest restarts: a reappearing key's first
    * observations see `prior_n = 0` and flag nothing until 2 fresh
    * observations accrue — stats older than the TTL no longer describe
    * the key, so judging against them would be the wrong answer, not a
    * convenience (StatsStreamSpec pins the restart). */
  def runningZscoreFlagsTtl(events: DataFrame, keyCol: String, idCol: String,
      centsCol: Column, z: Double, tsCol: String, ttl: String,
      watermarkDelay: String = "0 seconds"): Dataset[Flagged] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttlMillis = EventTimeTtl.millis(ttl)
    val obs = events.select(col(keyCol).cast("string").as("key"),
        col(idCol).cast("long").as("id"), centsCol.cast("long").as("cents"),
        timestamp_micros(col(tsCol).cast("long")).as("ets"))
      .withWatermark("ets", watermarkDelay)
      .as[ObsT]
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (key: String, rows: Iterator[ObsT], state: GroupState[KeyStats]) => {
          if (state.hasTimedOut) {
            state.remove() // TTL expiry: the key's stats no longer describe it
            Iterator.empty
          } else {
            val batch = rows.toVector
            if (batch.isEmpty) Iterator.empty
            else {
              val st = state.getOption.getOrElse(KeyStats(0L, 0L, 0L))
              val out = batch.map(o =>
                Flagged(key, o.id, o.cents, st.n, judge(st, o.cents, z)))
              state.update(KeyStats(st.n + batch.size,
                st.s + batch.iterator.map(_.cents).sum,
                st.s2 + batch.iterator.map(o => o.cents * o.cents).sum))
              EventTimeTtl.arm(state, batch.map(_.ets.getTime).max, ttlMillis)
              out.iterator
            }
          }
        })
  }
}
