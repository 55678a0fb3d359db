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
  * 4)` with lexicographic min). For null-free inputs — all the query
  * paths, which filter empty/null shingles upstream — the semantics are
  * BIT-IDENTICAL to the higher-order-function formulation they replace
  * (TextOps.hashedShingles / the `mh` transform in Dedup.minhashPairs):
  * hex is lowercase like Spark's `md5()`, and numeric byte order equals
  * the hex strings' binary order. Null ELEMENTS are skipped (the HOF
  * chain would propagate null entries instead — see [[sketch]]). A
  * single fused loop replaces per-element interpreted lambda dispatch,
  * which dominated the dedup prep stage in the bench. */
object ShingleHash {
  private val hexChars = "0123456789abcdef".toCharArray

  // JCA provider lookup is a per-call tax; the kernel runs once per row
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def sortedDistinct(xs: Array[Long], n: Int): Array[Long] = {
    if (n == 0) return Array.emptyLongArray
    java.util.Arrays.sort(xs, 0, n)
    var out = 1
    var i = 1
    while (i < n) {
      if (xs(i) != xs(out - 1)) { xs(out) = xs(i); out += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(xs, out)
  }

  /** First 15 hex digits of the digest as a long = the top 60 bits of the
    * first 8 bytes (big-endian >>> 4) — equals
    * `conv(substring(md5(s),1,15),16,10)` with zero string allocation. */
  private def head60(d: Array[Byte]): Long = {
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    v >>> 4
  }

  /** 4-hex-char slice `b` as an unsigned 16-bit int (bytes 2b, 2b+1):
    * lexicographic order on lowercase hex == numeric order, so mins can
    * be tracked as ints and only the 8 winners materialized as strings. */
  private def slice16(d: Array[Byte], b: Int): Int =
    ((d(2 * b) & 0xff) << 8) | (d(2 * b + 1) & 0xff)

  private def hex4(v: Int): UTF8String = {
    val cs = new Array[Char](4)
    cs(0) = hexChars((v >> 12) & 0xf); cs(1) = hexChars((v >> 8) & 0xf)
    cs(2) = hexChars((v >> 4) & 0xf); cs(3) = hexChars(v & 0xf)
    UTF8String.fromString(new String(cs))
  }

  /** (sorted-distinct hashed ids, 8 minhash slices) in one digest pass
    * per shingle. NULL elements are SKIPPED (they carry no shingle; the
    * query paths never produce them — documented contract for the public
    * SQL surface, where the old HOF chain would have propagated null
    * elements instead of crashing). */
  def sketch(shingles: ArrayData): InternalRow = {
    val n = shingles.numElements()
    val md = mdLocal.get()
    val ds = new Array[Long](n)
    val mins = Array.fill(8)(-1)
    var k = 0
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        md.reset()
        val d = md.digest(shingles.getUTF8String(i).getBytes)
        ds(k) = head60(d); k += 1
        var b = 0
        while (b < 8) {
          val s = slice16(d, b)
          if (mins(b) < 0 || s < mins(b)) mins(b) = s
          b += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      ArrayData.toArrayData(sortedDistinct(ds, k)),
      ArrayData.toArrayData(mins.map(m => if (m < 0) null else hex4(m)))))
  }

  /** Just the sorted-distinct hashed-shingle set (null elements skipped). */
  def hashedSet(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val md = mdLocal.get()
    val ds = new Array[Long](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        md.reset()
        ds(k) = head60(md.digest(shingles.getUTF8String(i).getBytes))
        k += 1
      }
      i += 1
    }
    ArrayData.toArrayData(sortedDistinct(ds, k))
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
