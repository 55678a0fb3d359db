package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared JVM kernel for the shingle-hashing expressions: ONE md5 pass
  * per shingle yields both the 60-bit hashed-shingle id (first 15 hex
  * digits → long, = `conv(substring(md5(s),1,15),16,10)`) and the eight
  * 16-bit minhash slices (4 hex chars each, = `substring(md5(s), i*4+1,
  * 4)` with lexicographic min). Semantics are BIT-IDENTICAL to the
  * higher-order-function formulation they replace (TextOps.hashedShingles
  * / the `mh` transform in Dedup.minhashPairs) — hex is lowercase like
  * Spark's `md5()`, and String.compareTo on ASCII hex equals
  * UTF8String's binary comparison — but a single fused loop replaces
  * per-element interpreted lambda dispatch, which dominated the dedup
  * prep stage in the bench. */
object ShingleHash {
  private val hexChars = "0123456789abcdef".toCharArray

  private def md5HexOf(md: java.security.MessageDigest, s: UTF8String): String = {
    md.reset()
    val digest = md.digest(s.getBytes)
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = hexChars((digest(j) >> 4) & 0xf)
      hex(2 * j + 1) = hexChars(digest(j) & 0xf)
      j += 1
    }
    new String(hex)
  }

  private def sortedDistinct(xs: Array[Long]): Array[Long] = {
    if (xs.length == 0) return xs
    java.util.Arrays.sort(xs)
    var out = 1
    var i = 1
    while (i < xs.length) {
      if (xs(i) != xs(out - 1)) { xs(out) = xs(i); out += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(xs, out)
  }

  /** (sorted-distinct hashed ids, 8 minhash slices) in one pass. */
  def sketch(shingles: ArrayData): InternalRow = {
    val n = shingles.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val ds = new Array[Long](n)
    val mh = new Array[String](8)
    var i = 0
    while (i < n) {
      val h = md5HexOf(md, shingles.getUTF8String(i))
      ds(i) = java.lang.Long.parseLong(h.substring(0, 15), 16)
      var b = 0
      while (b < 8) {
        val slice = h.substring(b * 4, b * 4 + 4)
        if (mh(b) == null || slice.compareTo(mh(b)) < 0) mh(b) = slice
        b += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      ArrayData.toArrayData(sortedDistinct(ds)),
      ArrayData.toArrayData(mh.map(m =>
        if (m == null) null else UTF8String.fromString(m)))))
  }

  /** Just the sorted-distinct hashed-shingle set. */
  def hashedSet(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val ds = new Array[Long](n)
    var i = 0
    while (i < n) {
      ds(i) = java.lang.Long.parseLong(
        md5HexOf(md, shingles.getUTF8String(i)).substring(0, 15), 16)
      i += 1
    }
    ArrayData.toArrayData(sortedDistinct(ds))
  }
}

private[functions] trait ShingleInput extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
}

/** `graft_shingle_sketch(array<string>) -> struct<ds array<long>, mh
  * array<string>>` — the minhash prep kernel. */
case class ShingleSketch(child: Expression) extends ShingleInput {
  override def dataType: DataType = StructType(Seq(
    StructField("ds", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("mh", ArrayType(StringType, containsNull = true), nullable = false)))
  override def prettyName: String = "graft_shingle_sketch"
  override def nullSafeEval(v: Any): Any =
    ShingleHash.sketch(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHash.sketch($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_shingle_set(array<string>) -> array<long>` — sorted-distinct
  * 60-bit hashed shingles (the Jaccard / decontamination kernel). */
case class ShingleSet(child: Expression) extends ShingleInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"
  override def nullSafeEval(v: Any): Any =
    ShingleHash.hashedSet(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHash.hashedSet($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
