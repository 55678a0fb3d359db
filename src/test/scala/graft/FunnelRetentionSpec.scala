package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventOps

/** Ordering semantics the funnel/retention operators exist for: a later
  * stage only counts AFTER the previous stage's reach time, and cohorts
  * anchor to each user's first active day. */
class FunnelRetentionSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (user, type, ts_us)
  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "ts_us")

  test("funnelReach: out-of-order purchase does not complete the funnel") {
    // u1: clean signup→click→purchase; u2: purchase BEFORE click (stage 3
    // must be null); u3: signup only; u4: never signs up (no row at all)
    val df = ev(
      (1L, "signup", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "signup", 100L), (2L, "purchase", 150L), (2L, "click", 200L),
      (3L, "signup", 100L),
      (4L, "click", 100L), (4L, "purchase", 200L))
    val r = EventOps.funnelReach(df, "user_id", "event_type", "ts_us",
        Seq("signup", "click", "purchase"))
      .select("user_id", "t1", "t2", "t3")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

    assert(r.keySet == Set(1L, 2L, 3L), "only signed-up users appear")
    assert(r(1L) == (Some(100L), Some(200L), Some(300L)))
    assert(r(2L) == (Some(100L), Some(200L), None),
      "purchase before first click must not count")
    assert(r(3L) == (Some(100L), None, None))
  }

  test("funnelReach: equal timestamps satisfy the at-or-after contract") {
    val df = ev((1L, "signup", 100L), (1L, "click", 100L), (1L, "purchase", 100L))
    val r = EventOps.funnelReach(df, "user_id", "event_type", "ts_us",
        Seq("signup", "click", "purchase"))
      .select("t1", "t2", "t3").as[(Long, Long, Long)].collect().head
    assert(r == ((100L, 100L, 100L)))
  }

  test("funnelReach: earliest qualifying event wins, not earliest overall") {
    // clicks at 50 (before signup) and 400: t2 must be 400
    val df = ev((1L, "signup", 100L), (1L, "click", 50L), (1L, "click", 400L))
    val r = EventOps.funnelReach(df, "user_id", "event_type", "ts_us",
        Seq("signup", "click"))
      .select("t1", "t2").as[(Long, Long)].collect().head
    assert(r == ((100L, 400L)))
  }

  test("funnelReach equals a brute-force cascade on generated event sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val stages = Seq("signup", "click", "purchase")
    val evGen = for {
      u <- Gen.chooseNum(1L, 6L)
      st <- Gen.oneOf(stages :+ "noise")
      ts <- Gen.chooseNum(0L, 50L)
    } yield (u, st, ts)
    for (i <- 0 until 8;
         rows <- Gen.listOfN(40, evGen).apply(Gen.Parameters.default, Seed(7L + i))) {
      // brute force: per user, literal cascade over full event lists
      val expected = rows.groupBy(_._1).flatMap { case (u, es) =>
        def times(s: String) = es.filter(_._2 == s).map(_._3)
        val t1 = times("signup").minOption
        val t2 = t1.flatMap(p => times("click").filter(_ >= p).minOption)
        val t3 = t2.flatMap(p => times("purchase").filter(_ >= p).minOption)
        t1.map(_ => u -> ((t1, t2, t3)))
      }
      val got = EventOps.funnelReach(rows.toDF("user_id", "event_type", "ts_us"),
          "user_id", "event_type", "ts_us", stages)
        .select("user_id", "t1", "t2", "t3")
        .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      assert(got == expected, s"case $i: $rows")
    }
  }

  test("resampleTumbling: complete grid, zero-filled gaps, totals conserved") {
    // two types; type a active in windows 0 and 2 (gap at 1), type b only
    // in window 1 → grid must be 3 windows × 2 types = 6 cells
    val df = Seq(
      ("a", 10L, 1.0), ("a", 1210L, 2.0),
      ("b", 650L, 5.0)).toDF("event_type", "ts_s", "value")
      .withColumn("ts_us", col("ts_s") * 1000000L).drop("ts_s")
    val out = graft.operators.EventOps.resampleTumbling(df, seconds = 600)
      .select("window_start", "event_type", "n")
      .as[(Long, String, Long)].collect()
    assert(out.length == 6, "every (type, window) cell present")
    val m = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(m == Map(
      (0L, "a") -> 1L, (600L, "a") -> 0L, (1200L, "a") -> 1L,
      (0L, "b") -> 0L, (600L, "b") -> 1L, (1200L, "b") -> 0L))
  }

  test("transition counts conserve: Σ matrix = Σ per-user (n_events − 1)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val evGen = for {
      u <- Gen.chooseNum(1L, 4L)
      t <- Gen.oneOf("a", "b", "c")
      ts <- Gen.chooseNum(0L, 30L)
    } yield (u, t, ts)
    for (i <- 0 until 5;
         rows <- Gen.listOfN(25, evGen).apply(Gen.Parameters.default, Seed(3L + i))) {
      val df = rows.zipWithIndex
        .map { case ((u, t, ts), id) => (id.toLong, u, t, ts) }
        .toDF("event_id", "user_id", "event_type", "ts_us")
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val total = df.withColumn("prev", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n"))).as[Long].collect().head
      val expected = rows.groupBy(_._1).values.map(_.size.toLong - 1).sum
      assert(total == expected, s"case $i lost or invented transitions")
    }
  }

  test("zscoreFlags: only the >zσ outlier is flagged; stats broadcast per key") {
    // nine 100-cent events + one 1000-cent outlier: mean=190, σ≈270 →
    // only the outlier exceeds 2σ... σ here: E[X²]−E[X]² of
    // (9×100,1×1000) = 72900 ⇒ σ=270; |1000−190|=810 > 540 ✓,
    // |100−190|=90 < 540 ✓
    val df = ((1 to 9).map(i => (i.toLong, "a", 100L)) :+ ((10L, "a", 1000L)))
      .toDF("event_id", "event_type", "cents")
    val flagged = graft.operators.EventOps
      .zscoreFlags(df, "event_type", col("cents"), z = 2.0)
      .select("event_id", "is_anom").as[(Long, Boolean)].collect().toMap
    assert(flagged(10L), "outlier flagged")
    assert((1L to 9L).forall(!flagged(_)), "inliers unflagged")
  }

  test("retentionMatrix equals a brute-force cohort walk on generated events") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val day = 86400000000L
    val evGen = for {
      u <- Gen.chooseNum(1L, 5L)
      d <- Gen.chooseNum(0L, 6L)
      off <- Gen.chooseNum(0L, day - 1)
    } yield (u, d * day + off)
    for (i <- 0 until 8;
         rows <- Gen.listOfN(30, evGen).apply(Gen.Parameters.default, Seed(99L + i))) {
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        val days = es.map(_._2 / day).distinct
        val cohort = days.min
        days.map(d => (cohort, d - cohort))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = EventOps.retentionMatrix(rows.toDF("user_id", "ts_us"),
          "user_id", "ts_us")
        .as[(Long, Long, Long)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
      assert(got == expected, s"case $i: $rows")
    }
  }

  test("retentionMatrix: offsets anchor to each user's first day") {
    val day = 86400000000L
    // u1 joins day 0, active days 0,1,3; u2 joins day 1, active days 1,2;
    // two events on one day must count once
    val df = Seq(
      (1L, day * 0 + 5L), (1L, day * 0 + 9L), (1L, day * 1 + 1L), (1L, day * 3 + 1L),
      (2L, day * 1 + 2L), (2L, day * 2 + 3L)).toDF("user_id", "ts_us")
    val m = EventOps.retentionMatrix(df, "user_id", "ts_us")
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap
    assert(m == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("pmiCooccurrence: hand-computed marginals, pairs, and zero-PMI quantization") {
    // 3 sessions: {x,y}, {x,y}, {x,z} — P(x)=1 so PMI(x,·)=ln(1)=0
    val events = Seq(
        (1L, 1L, "x", 1000L), (2L, 1L, "y", 2000L),
        (3L, 2L, "x", 1000L), (4L, 2L, "y", 2000L),
        (5L, 3L, "x", 1000L), (6L, 3L, "z", 2000L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val out = EventOps.pmiCooccurrence(events, gapUs = 1000000L)
      .orderBy("type_a", "type_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("x", "y", 2L, 0L), ("x", "z", 1L, 0L)))
  }

  test("ewmaScaled: dyadic filter is integer-exact (hand-computed taps)") {
    val events = Seq(
        (1L, "m", 1000L, 0.01), (2L, "m", 2000L, 0.02), (3L, "m", 3000L, 0.03))
      .toDF("event_id", "event_type", "ts_us", "value")
    val out = EventOps.ewmaScaled(events, taps = 20)
      .orderBy("event_id").collect().map(_.getLong(2)).toSeq
    // cents 1,2,3: e1=1·2^19; e2=2·2^19+1·2^18; e3=3·2^19+2·2^18+1·2^17
    assert(out == Seq(524288L, 1310720L, 2228224L))
  }
}
