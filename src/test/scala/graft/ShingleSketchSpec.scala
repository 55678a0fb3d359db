package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** The native ShingleSketch/ShingleSet kernels must be bit-identical to
  * the higher-order-function formulations they replaced (md5 hex slices,
  * lexicographic mins, sorted-distinct 60-bit ids). The codegen path is
  * exercised through DataFrame queries, the interpreted path through
  * direct `eval` on the expression. */
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

  test("ShingleSet matches the documented reference TextOps.hashedShingles") {
    graft.functions.GraftFunctions.register(spark)
    val docs = (0 until 30).map(i =>
      (i.toLong, (0 until 8).map(j => s"t${(i + j * 5) % 25}").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = docs.select(
        TextOps.shingles(TextOps.tokens(col("text"))).as("sh"))
      .select(
        graft.functions.GraftFunctions.shingleSet(col("sh")).as("native"),
        array_sort(array_distinct(TextOps.hashedShingles(col("sh")))).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("native") ==
        r.getAs[scala.collection.Seq[Long]]("ref"))
    }
  }

  test("interpreted path (direct eval) matches, and null elements are skipped") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val arr = Literal.create(
      ArrayData.toArrayData(Array(UTF8String.fromString("a b c"), null,
        UTF8String.fromString("b c d"))),
      ArrayType(StringType, containsNull = true))
    // eval (nullSafeEval) — never goes through Janino
    val sk = graft.functions.ShingleSketch(arr).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val set = graft.functions.ShingleSet(arr).eval(null)
      .asInstanceOf[ArrayData]
    // expected via java MessageDigest on the two non-null shingles
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      var v = 0L; (0 until 8).foreach(j => v = (v << 8) | (d(j) & 0xffL)); v >>> 4
    }
    val expect = Seq("a b c", "b c d").map(h60).distinct.sorted
    assert(sk.getArray(0).toLongArray.toSeq == expect)
    assert(set.toLongArray.toSeq == expect, "null element must be skipped, not crash")
    assert(sk.getArray(1).numElements() == 8)
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
