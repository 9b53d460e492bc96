package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native squared-L2 distance of two `array<double>` columns — the other
  * hot kernel of the ANN/k-means family ([[DotProduct]] covers the dot
  * form).
  *
  * Semantics replicate `aggregate(zip_with(a, b, (x,c) -> (x-c)*(x-c)),
  * 0D, (acc,v) -> acc+v)` exactly: per element the difference is taken
  * once and squared by self-multiplication, accumulation is left-to-right
  * double, zip_with's unequal-length null padding and element-null
  * poisoning yield NULL. Bitwise-identical results, so the
  * [[RewriteDotProduct]] rule can substitute this for the interpreted
  * HOF fold without any oracle drift. */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"l2_sq expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
    val hasNull = ctx.freshName("hasNull")
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${leftGen.isNull} && !${rightGen.isNull}) {
        int $n = ${leftGen.value}.numElements();
        if ($n == ${rightGen.value}.numElements()) {
          boolean $hasNull = false;
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
              $hasNull = true; break;
            }
            double $d = ${leftGen.value}.getDouble($i) - ${rightGen.value}.getDouble($i);
            $acc += $d * $d;
          }
          if (!$hasNull) { ${ev.isNull} = false; ${ev.value} = $acc; }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}
