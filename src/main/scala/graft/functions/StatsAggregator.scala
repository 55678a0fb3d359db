package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass (sum, count, min, max) typed aggregate — the user-facing
  * `Aggregator[IN, BUF, OUT]` extension surface (SURVEY §2.2). Where the
  * reference extends via PL/pgSQL functions, this library's typed
  * extension point is an Aggregator usable from `Dataset.groupByKey` or
  * as a `TypedColumn`. Sums stay exact for integral-valued doubles, so
  * the DuckDB oracle (plain min/max/sum/count SQL) matches. */
case class Stats(sum: Double, count: Long, min: Double, max: Double)

class StatsAggregator extends Aggregator[Double, Stats, Stats] {
  override def zero: Stats =
    Stats(0.0, 0L, Double.PositiveInfinity, Double.NegativeInfinity)
  override def reduce(b: Stats, v: Double): Stats =
    Stats(b.sum + v, b.count + 1, math.min(b.min, v), math.max(b.max, v))
  override def merge(a: Stats, b: Stats): Stats =
    Stats(a.sum + b.sum, a.count + b.count,
      math.min(a.min, b.min), math.max(a.max, b.max))
  override def finish(r: Stats): Stats = r
  override def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
  override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
}
