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
}
