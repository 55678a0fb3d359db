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
  * magnitude sparser than the log; a TTL policy would bolt on via
  * EventTimeTimeout if a deployment needs eviction).
  *
  * Emits one row per (user, batch-with-news): the reach vector plus
  * `n_seen` — monotonically growing, so "row with max n_seen per user"
  * is the user's final state in any at-least-once sink. */
object FunnelStream {

  case class StageObs(user: Long, stage: Int, ts: Long)
  case class FunnelState(times: Seq[Seq[Long]])
  case class Reach(user_id: Long, n_seen: Long, reach: Seq[Option[Long]])

  /** The cascade shared with the spec's batch replay: earliest time per
    * stage, each stage at-or-after the previous stage's reach. */
  def cascade(times: Seq[Seq[Long]]): Seq[Option[Long]] =
    times.foldLeft(Vector.empty[Option[Long]]) { (acc, ts) =>
      val prev = acc.lastOption.getOrElse(Some(Long.MinValue))
      acc :+ prev.flatMap(p => ts.filter(_ >= p).minOption)
    }

  def runningFunnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): Dataset[Reach] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stageExpr = stages.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(acc) }
    val obs = events
      .select(col(userCol).cast("long").as("user"), stageExpr.as("stage"),
        col(tsCol).cast("long").as("ts"))
      .filter(col("stage") >= 0).as[StageObs]
    obs.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[StageObs], state: GroupState[FunnelState]) => {
          val st = state.getOption
            .getOrElse(FunnelState(Vector.fill(stages.length)(Vector.empty)))
          val batch = rows.toVector
          if (batch.isEmpty) Iterator.empty
          else {
            val merged = FunnelState(st.times.zipWithIndex.map { case (ts, i) =>
              (ts ++ batch.filter(_.stage == i).map(_.ts)).sorted
            })
            state.update(merged)
            val n = merged.times.map(_.size.toLong).sum
            Iterator.single(Reach(user, n, cascade(merged.times)))
          }
        })
  }
}
