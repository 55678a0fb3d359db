package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observed event carrying its series' FROZEN target. */
case class CusumObs(typ: String, tsUs: Long, cents: Long, target: Long)

/** Per-type keyed state: the running CUSUM fold — SIX longs. */
case class CusumState(n: Long, cusum: Long, maxC: Long, minC: Long,
    absDev: Long, seq: Long)

/** The state snapshot emitted after each micro-batch touches a type. */
case class CusumSnap(typ: String, target: Long, n: Long, cusum: Long,
    maxC: Long, minC: Long, absDev: Long, seq: Long)

/** Streaming CUSUM drift monitor — the stateful twin of the batch
  * `events_cusum` window fold. The batch form's target is the series'
  * own global mean (a two-pass statistic); the streaming form deploys
  * the way a production CUSUM does: the target is CALIBRATED OFFLINE
  * (the frozen-state-argument pattern the funnel/SCD2 twins use) and
  * joined onto the stream as a static side, then each arrival folds
  * dev = cents − target into six longs of keyed state per type —
  * running CUSUM, its extrema, the absolute-deviation mass, n. The
  * drained last snapshot per type reproduces the batch report
  * EXACTLY (max/min of all prefix sums and Σ|dev| are
  * order-prefix-invariant aggregates of the same deterministic
  * sequence), so the entry gates against the untouched batch oracle.
  *
  * 100 TB/continuous shape: state is O(types)·6 longs; each batch
  * shuffles only its own rows to the type-keyed state partitions.
  * Event-TIME order across waves is the suite's ordered-waves
  * contract (Markov/Holt/attribution); within a batch rows are
  * sorted before folding. NoTimeout: types-bounded state needs no
  * TTL. */
object CusumStream {

  def levels(events: DataFrame, targets: DataFrame): Dataset[CusumSnap] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type").as("typ"),
        expr("ts div 1000").as("tsUs"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .join(broadcast(targets.select(col("event_type").as("typ"),
        col("mean_cents").as("target"))), Seq("typ"))
      .as[CusumObs]
      .groupByKey(_.typ)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (typ: String, rows: Iterator[CusumObs],
            state: GroupState[CusumState]) => {
          var st = state.getOption.getOrElse(
            CusumState(0, 0, Long.MinValue, Long.MaxValue, 0, 0))
          var target = 0L
          rows.toVector.sortBy(_.tsUs).foreach { r =>
            target = r.target
            val dev = r.cents - r.target
            val c = st.cusum + dev
            st = CusumState(st.n + 1, c, math.max(st.maxC, c),
              math.min(st.minC, c), st.absDev + math.abs(dev), st.seq)
          }
          st = st.copy(seq = st.seq + 1)
          state.update(st)
          Iterator.single(CusumSnap(typ, target, st.n, st.cusum,
            st.maxC, st.minC, st.absDev, st.seq))
        })
  }
}
