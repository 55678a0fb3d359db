package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.operators.VectorOps

/** The native codegen dot product must be bit-identical to the HOF fold
  * it replaces (sequential left-to-right double accumulation). */
class DotProductFloatSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native expression matches the HOF fold bit-for-bit, incl. interpreted mode") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.61f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
    val out = df.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      VectorOps.dotHof(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
    assert(out(0).getDouble(0) == 32.0)
    assert(out(2).getDouble(0) == 0.0)
  }

  test("integer dot: native expression equals the HOF fold; exact longs") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(127, -127, 64), Array(127, 127, -64)),
      (Array(1, 2, 3), Array(4, 5, 6)),
      (Array.empty[Int], Array.empty[Int]))
      .toDF("a", "b")
    val out = df.select(
      VectorOps.dotQ(col("a"), col("b")).as("native"),
      VectorOps.dotQHof(col("a"), col("b")).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(out(0).getLong(0) == 127L * 127 - 127L * 127 - 64L * 64)
    assert(out(1).getLong(0) == 32L)
    assert(out(2).getLong(0) == 0L)
  }

  test("NULL array yields NULL") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(VectorOps.dot(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("ragged lengths yield NULL — native and HOF forms agree on malformed input") {
    // ADVICE r9 #4: zip_with pads the short side with null, poisoning
    // the HOF sum to NULL; the native expressions used to truncate to
    // min-length — the two "identical" formulations disagreed exactly
    // when inputs were malformed. Now both are NULL, both types.
    GraftFunctions.register(spark)
    val f = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(VectorOps.dot(col("a"), col("b")).as("native"),
        VectorOps.dotHof(col("a"), col("b")).as("hof")).collect().head
    assert(f.isNullAt(0) && f.isNullAt(1))
    val i = Seq((Array(1, 2, 3), Array(1, 2))).toDF("a", "b")
      .select(VectorOps.dotQ(col("a"), col("b")).as("native"),
        VectorOps.dotQHof(col("a"), col("b")).as("hof")).collect().head
    assert(i.isNullAt(0) && i.isNullAt(1))
  }

  test("cosine of a vector with itself is exactly 1 after rounding") {
    GraftFunctions.register(spark)
    val df = Seq(Tuple1(Array(0.3f, -0.7f, 0.648f))).toDF("v")
    val r = df.select(round(VectorOps.cosine(col("v"), col("v")), 6)).collect().head
    assert(r.getDouble(0) == 1.0)
  }
}
