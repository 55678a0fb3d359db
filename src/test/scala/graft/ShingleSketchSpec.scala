package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** The native ShingleSketch/ShingleSet kernels must be bit-identical to
  * the higher-order-function formulations they replaced (md5 hex slices,
  * lexicographic mins, sorted-distinct 60-bit ids) — including the
  * interpreted (nullSafeEval) path. */
class ShingleSketchSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofReference(shingles: org.apache.spark.sql.Column) = {
    val hs = transform(shingles, s => md5(s))
    val ds = array_sort(array_distinct(transform(hs,
      h => conv(substring(h, 1, 15), 16, 10).cast("long"))))
    val mh = array((0 until 8).map { i =>
      array_min(transform(hs, h => substring(h, i * 4 + 1, 4)))
    }: _*)
    (ds, mh)
  }

  test("sketch ds/mh match the HOF md5 formulation on random docs") {
    graft.functions.GraftFunctions.register(spark)
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 until (i % 9) + 1).map(j => s"w${(i * 7 + j * 3) % 40}").mkString(" "))
    }.toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      TextOps.shingles(TextOps.tokens(col("text"))).as("shingles"))
    val (dsRef, mhRef) = hofReference(col("shingles"))
    val rows = sh.select(col("doc_id"),
        graft.functions.GraftFunctions.shingleSketch(col("shingles")).as("sk"),
        graft.functions.GraftFunctions.shingleSet(col("shingles")).as("set"),
        dsRef.as("ds_ref"), mhRef.as("mh_ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sk = r.getStruct(r.fieldIndex("sk"))
      assert(sk.getAs[scala.collection.Seq[Long]]("ds") == r.getAs[scala.collection.Seq[Long]]("ds_ref"),
        s"ds mismatch for doc ${r.getLong(0)}")
      assert(sk.getAs[scala.collection.Seq[String]]("mh") == r.getAs[scala.collection.Seq[String]]("mh_ref"),
        s"mh mismatch for doc ${r.getLong(0)}")
      assert(r.getAs[scala.collection.Seq[Long]]("set") == r.getAs[scala.collection.Seq[Long]]("ds_ref"))
    }
  }

  test("empty shingle array: empty ds, all-null mh (array_min-over-empty semantics)") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, "a b")).toDF("doc_id", "text") // <3 tokens → no shingles
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingleSketch(
          TextOps.shingles(TextOps.tokens(col("text")))).as("sk"))
    val sk = df.collect()(0).getStruct(1)
    assert(sk.getAs[scala.collection.Seq[Long]]("ds").isEmpty)
    assert(sk.getAs[scala.collection.Seq[String]]("mh") == Seq.fill(8)(null))
  }
}
