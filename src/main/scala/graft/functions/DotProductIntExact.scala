package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: Σ aᵢ·bᵢ over two `array<int>` columns,
  * accumulated in long — exact (int8-quantized components keep every
  * product ≤ 127², far from overflow), order-independent by
  * construction, and codegen'd as a tight primitive loop. The
  * int-quantized twin of [[DotProductFloat]], for the same measured
  * reason: the `aggregate(zip_with(...))` HOF chain evaluates an
  * interpreted lambda per element, which dominates the quantized
  * similarity hot path.
  *
  * Null handling: a NULL array yields NULL, and so does a LENGTH
  * MISMATCH — the HOF cross-check `dotQHof` (zip_with pads the short
  * side with null, poisoning the sum) returns NULL on ragged input, and
  * the two formulations must agree on malformed vectors too, not just
  * well-formed ones (ADVICE r9 #4: the old min-length truncation
  * silently disagreed exactly when inputs were malformed). Elements are
  * assumed non-null (quantized embedding vectors).
  */
case class DotProductIntExact(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_i"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0L
      var i = 0
      while (i < n) { s += x.getInt(i).toLong * y.getInt(i).toLong; i += 1 }
      java.lang.Long.valueOf(s)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (long)$a.getInt($i) * (long)$b.getInt($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
