package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Number of positions where `right` (a token phrase) occurs verbatim
  * and in order inside `left` (a token array). Overlapping starts each
  * count; an empty phrase or a too-short array counts 0. The codegen'd
  * twin of the `size(filter(sequence(...), p -> element_at ...))` HOF
  * chain in phrase search — interpreted HOFs paid a lambda dispatch per
  * (position × phrase term), which dominated the scan (measured 1.56 s
  * at sf0.1). A null ELEMENT (either array) is simply never a match —
  * the SQL function is user-callable with arbitrary arrays, so the
  * non-null-tokens contract is enforced here rather than assumed
  * (ADVICE r9 #5: `getUTF8String` on a null slot threw NPE in both the
  * interpreted and codegen paths).
  */
case class PhraseCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phrase_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val t = a.asInstanceOf[ArrayData]
    val p = b.asInstanceOf[ArrayData]
    val n = t.numElements()
    val m = p.numElements()
    var c = 0L
    if (m > 0 && n >= m) {
      var i = 0
      while (i <= n - m) {
        var j = 0
        var ok = true
        while (ok && j < m) {
          if (t.isNullAt(i + j) || p.isNullAt(j) ||
            !t.getUTF8String(i + j).equals(p.getUTF8String(j))) ok = false
          j += 1
        }
        if (ok) c += 1
        i += 1
      }
    }
    java.lang.Long.valueOf(c)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val ok = ctx.freshName("ok")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |long $c = 0L;
         |if ($m > 0 && $n >= $m) {
         |  for (int $i = 0; $i <= $n - $m; $i++) {
         |    boolean $ok = true;
         |    for (int $j = 0; $ok && $j < $m; $j++) {
         |      if ($a.isNullAt($i + $j) || $b.isNullAt($j) ||
         |          !$a.getUTF8String($i + $j).equals($b.getUTF8String($j))) $ok = false;
         |    }
         |    if ($ok) $c++;
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
