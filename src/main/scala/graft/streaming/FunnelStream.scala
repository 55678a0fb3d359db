package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel — the continuous twin of
  * [[graft.operators.EventOps.funnelReach]], with FULL out-of-order
  * fidelity: micro-batch boundaries carry no semantic weight, and a
  * stage event arriving late (even a new EARLIEST signup that lowers t1
  * and re-qualifies a previously-discarded click) converges to exactly
  * what the batch cascade computes over the same events. That property
  * is impossible with scalar "current reach" state — so the state keeps
  * each user's per-stage event TIMES (sorted), and the reach cascade is
  * recomputed per batch. State is bounded by the user's stage-event
  * count (stage events are the funnel-relevant subset, orders of
  * magnitude sparser than the log); against a truly unbounded log, pass
  * `ttl` to evict idle users by EVENT time (see [[runningFunnel]]).
  *
  * Output domain matches the batch twin (ADVICE r9 #2): a user emits
  * only once they have reached stage 1 — `funnelReach` starts from the
  * stage-1 groupBy, so users with only later-stage events produce no
  * batch row and now produce no stream row either. Duplicate stage
  * names are rejected up front (the batch cascade supports them, but
  * `stageExpr` maps each event type to ONE stage index, so earlier
  * duplicates would sit permanently empty — a silent contract break).
  *
  * Emits one row per (user-with-stage-1-reach, batch-with-news): the
  * reach vector plus `n_seen` — monotonically growing (within one TTL
  * epoch), so "row with max n_seen per user" is the user's final state
  * in any at-least-once sink. */
object FunnelStream {

  case class StageObs(user: Long, stage: Int, ts: Long)
  // not `private`: the Dataset encoder's generated SafeProjection needs
  // bytecode access to the case class
  case class StageObsT(user: Long, stage: Int, ts: Long,
      ets: java.sql.Timestamp)
  case class FunnelState(times: Seq[Seq[Long]])
  case class Reach(user_id: Long, n_seen: Long, reach: Seq[Option[Long]])

  /** The cascade shared with the spec's batch replay: earliest time per
    * stage, each stage at-or-after the previous stage's reach. */
  def cascade(times: Seq[Seq[Long]]): Seq[Option[Long]] =
    times.foldLeft(Vector.empty[Option[Long]]) { (acc, ts) =>
      val prev = acc.lastOption.getOrElse(Some(Long.MinValue))
      acc :+ prev.flatMap(p => ts.filter(_ >= p).minOption)
    }

  /** Merge a batch of observations into the user's per-stage times and
    * emit the recomputed cascade — shared by the NoTimeout and TTL
    * paths so their funnel semantics cannot drift. No emission until
    * the user reaches stage 1 (batch-twin output domain). */
  private def mergeAndEmit(user: Long, batch: Vector[StageObs],
      state: GroupState[FunnelState], nStages: Int): Iterator[Reach] = {
    val st = state.getOption
      .getOrElse(FunnelState(Vector.fill(nStages)(Vector.empty)))
    val merged = FunnelState(st.times.zipWithIndex.map { case (ts, i) =>
      (ts ++ batch.filter(_.stage == i).map(_.ts)).sorted
    })
    state.update(merged)
    val reach = cascade(merged.times)
    if (reach.head.isEmpty) Iterator.empty
    else {
      val n = merged.times.map(_.size.toLong).sum
      Iterator.single(Reach(user, n, reach))
    }
  }

  /** `ttl = None` (default): state lives for the stream's lifetime —
    * right when the funnel-relevant event subset is bounded (a campaign
    * window, a capped cohort). `ttl = Some("30 minutes")`: a user idle
    * for `ttl` of EVENT time past the watermark has their whole state
    * evicted — the same replay-deterministic EventTimeTimeout
    * discipline as [[CdcStream.statefulDedupTtl]] (wall-clock timeouts
    * would also force empty micro-batches forever; see there).
    * `watermarkDelay` is the allowed out-of-orderness of `tsCol`
    * (microseconds), only consulted when `ttl` is set.
    *
    * Eviction semantics: expiry FORGETS the user's funnel history —
    * a later event re-creates state from empty, so `n_seen` restarts
    * and the cascade covers only post-expiry events. That can never
    * emit a WRONG reach vector (one mixing forgotten history with new
    * events): the fresh state contains exactly the new events, and the
    * stage-1 emission gate keeps a post-expiry later-stage straggler
    * from emitting at all. FunnelStreamSpec pins both halves. */
  def runningFunnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], ttl: Option[String] = None,
      watermarkDelay: String = "0 seconds"): Dataset[Reach] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"duplicate funnel stages: $stages (each event type maps to one " +
        "stage index — earlier duplicates would never fill)")
    val spark = events.sparkSession
    import spark.implicits._
    val stageExpr = stages.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(acc) }
    ttl match {
      case None =>
        val obs = events
          .select(col(userCol).cast("long").as("user"), stageExpr.as("stage"),
            col(tsCol).cast("long").as("ts"))
          .filter(col("stage") >= 0).as[StageObs]
        obs.groupByKey(_.user)
          .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
            (user: Long, rows: Iterator[StageObs], state: GroupState[FunnelState]) => {
              val batch = rows.toVector
              if (batch.isEmpty) Iterator.empty
              else mergeAndEmit(user, batch, state, stages.length)
            })
      case Some(t) =>
        val ttlMillis = EventTimeTtl.millis(t)
        // watermark BEFORE the stage filter (ADVICE r10): every event
        // advances the eviction clock, so idle-user state is reclaimed
        // even while no funnel-relevant events arrive — matching the
        // CdcStream/StatsStream discipline of watermarking the
        // unfiltered input. The filter must be a TYPED filter: a Column
        // predicate on `stage` doesn't reference the watermark column,
        // so PushPredicateThroughNonJoin would push it back below the
        // EventTimeWatermark node and filtered-out events would never
        // reach the watermark exec (FunnelStreamSpec's non-stage-events
        // test catches exactly that). The typed lambda consumes the
        // whole row, pins the filter above the watermark, and still
        // runs map-side before the groupByKey shuffle — only the sparse
        // stage subset is exchanged.
        val obs = events
          .select(col(userCol).cast("long").as("user"), stageExpr.as("stage"),
            col(tsCol).cast("long").as("ts"),
            timestamp_micros(col(tsCol).cast("long")).as("ets"))
          .withWatermark("ets", watermarkDelay)
          .as[StageObsT]
          .filter((o: StageObsT) => o.stage >= 0)
        obs.groupByKey(_.user)
          .flatMapGroupsWithState(OutputMode.Update,
            GroupStateTimeout.EventTimeTimeout)(
            (user: Long, rows: Iterator[StageObsT], state: GroupState[FunnelState]) => {
              if (state.hasTimedOut) {
                state.remove() // TTL expiry: forget the user's funnel history
                Iterator.empty
              } else {
                val batch = rows.toVector
                if (batch.isEmpty) Iterator.empty
                else {
                  val out = mergeAndEmit(user,
                    batch.map(o => StageObs(o.user, o.stage, o.ts)),
                    state, stages.length)
                  EventTimeTtl.arm(state, batch.map(_.ets.getTime).max, ttlMillis)
                  out
                }
              }
            })
    }
  }
}
