package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity of two strings —
  * the fuzzy-match scorer entity resolution reaches for when edit
  * distance over-penalizes transpositions and prefix-preserving typos.
  *
  * Semantics pinned to the DuckDB oracle's variant (verified equal on
  * the fixture's name corpus): standard Jaro with the max(|a|,|b|)/2−1
  * match window and half-transposition count, Winkler prefix boost
  * p = 0.1 over at most 4 prefix chars, applied ONLY when jaro > 0.7
  * (the classic boost threshold — DuckDB returns plain jaro at ≤ 0.7,
  * e.g. jw("abcdwxyz","abcdmnop") = 2/3 unboosted).
  *
  * `doGenCode` stays inside whole-stage codegen by emitting a call to
  * [[score]] on the referenced expression instance — the scorer is a
  * scalar O(|a|·window) loop, not worth inlining as generated Java.
  * Queries must wrap the result in `round(·, 6)` before ranking, the
  * same cross-engine float discipline as the cosine scorers.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType == StringType && right.dataType == StringType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override def nullable: Boolean = true

  def score(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    if (a == b) return 1.0
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var hit = false
      while (j < hi && !hit) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; hit = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (l < maxP && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(
      score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("jw", this, classOf[JaroWinklerSim].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $obj.score($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
