package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gate for the `pipeline_ingest_batch` capstone (the oracle
  * hash-match is the exact gate; this pins the flag logic readably):
  * every batch doc gets exactly one row, exact copies are dup-flagged,
  * and `kept` is precisely !is_dup && !is_contaminated && quality-pass. */
class IngestBatchSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private lazy val result =
    SparkEntry.queries("pipeline_ingest_batch")(spark, dir).collect()

  test("one row per batch doc") {
    val batchN = TextQueries.dupCorpus(Tables.documents(spark, dir))
      .filter(col("doc_id") >= 100000).count()
    assert(result.length.toLong == batchN)
    assert(result.map(_.getLong(0)).distinct.length == result.length)
  }

  test("exact copies are dup-flagged; kept is the conjunction of its gates") {
    // ids 200000+k are byte-exact copies of corpus docs — identical
    // minhash signatures collide in every band, so all must be dups
    val exactCopies = result.filter(_.getLong(0) >= 200000)
    assert(exactCopies.nonEmpty)
    assert(exactCopies.forall(_.getBoolean(3)), "an exact copy escaped the dup flag")
    result.foreach { r =>
      val expect = !r.getBoolean(3) && !r.getBoolean(4) && r.getDouble(1) >= 0.30
      assert(r.getBoolean(5) == expect, s"kept flag wrong for ${r.getLong(0)}: $r")
    }
  }

  test("near-copies of benchmark docs are contamination-flagged") {
    // batch doc 100000+k (k < 10, k % 3 == 0) is "xdup " + benchmark doc
    // k's text — it must share shingles with the benchmark set
    val benchCopies = result.filter { r =>
      val id = r.getLong(0); id >= 100000 && id < 100010 && (id - 100000) % 3 == 0
    }
    assert(benchCopies.nonEmpty)
    assert(benchCopies.forall(_.getBoolean(4)),
      "a near-copy of a benchmark doc escaped the contamination flag")
  }
}
