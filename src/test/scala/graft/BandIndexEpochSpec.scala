package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r8 #1a "done" criterion: two back-to-back
  * `dedup_incremental_indexed` invocations against DIFFERENT scale dirs
  * must not collide. The pre-fix query wrote one fixed global table
  * (`graft_band_index`) plus a `dir.hashCode` temp path, so whichever
  * invocation wrote last would be what an earlier invocation's lazily
  * executed probe read — a wrong-answer race, not just hygiene
  * (ADVICE r7 #3). The fix keys one index per (session, dir) epoch
  * ([[TextQueries.bandIndexFor]]); this spec pins the isolation. */
class BandIndexEpochSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private val dirA = "/root/testdata/sf0.001"
  private val dirB = "/root/testdata/sf0.01"

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def indexed(dir: String): Set[(Long, Long, Double)] =
    rows(SparkEntry.queries("dedup_incremental_indexed")(spark, dir))

  private def direct(dir: String): Set[(Long, Long, Double)] =
    rows(SparkEntry.queries("dedup_incremental")(spark, dir))

  test("per-dir epoch indexes don't collide across interleaved invocations") {
    // same (session, dir) reuses one epoch index — the build runs once
    val t1 = TextQueries.bandIndexFor(spark, dirA)
    assert(TextQueries.bandIndexFor(spark, dirA) == t1)

    val a1 = indexed(dirA)
    val b = indexed(dirB)
    // different dirs got different catalog tables
    assert(TextQueries.bandIndexFor(spark, dirB) != t1)
    // re-probing dirA AFTER dirB's epoch write must still read dirA's
    // index — under the old global table this returned dirB-shaped pairs
    val a2 = indexed(dirA)
    assert(a2 == a1, "dirA probe changed after dirB's index write — epochs collided")

    // and each indexed probe still equals its direct bipartite join
    assert(a1 == direct(dirA))
    assert(b == direct(dirB))
    assert(a1 != b, "scale dirs should produce different pair sets")
  }
}
