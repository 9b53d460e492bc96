package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[DotProduct]] expression, and the squared-L2 idiom
  * `(x - c) * (x - c)` into [[L2Squared]]. Higher-order functions
  * evaluate interpreted (per-element lambda dispatch); the native form is a
  * primitive loop inside whole-stage codegen. Results are bitwise-identical
  * (same left-to-right double accumulation, same null semantics — see
  * DotProduct), so users keep writing the declarative form and the engine
  * picks the fast plan: the Catalyst-idiomatic way to accelerate a hot
  * pattern (SURVEY §4.3's "custom Rule" extension point).
  *
  * Install via [[RewriteDotProduct.install]] (idempotent,
  * `spark.experimental.extraOptimizations`).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(aacc: NamedLambdaVariable, av: NamedLambdaVariable, _),
            Seq(macc: NamedLambdaVariable, mv: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(ff: NamedLambdaVariable), _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          mx.exprId == zx.exprId && my.exprId == zy.exprId &&
          aacc.exprId == macc.exprId && av.exprId == mv.exprId &&
          fin.exprId == ff.exprId =>
        DotProduct(a, b)
      // the squared-L2 idiom: zip lambda (x - c) * (x - c) with both
      // factors the SAME subtraction of the two lambda variables
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(
              Multiply(
                Subtract(sx1: NamedLambdaVariable, sy1: NamedLambdaVariable, _),
                Subtract(sx2: NamedLambdaVariable, sy2: NamedLambdaVariable, _), _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(aacc: NamedLambdaVariable, av: NamedLambdaVariable, _),
            Seq(macc: NamedLambdaVariable, mv: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(ff: NamedLambdaVariable), _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          sx1.exprId == zx.exprId && sy1.exprId == zy.exprId &&
          sx2.exprId == zx.exprId && sy2.exprId == zy.exprId &&
          aacc.exprId == macc.exprId && av.exprId == mv.exprId &&
          fin.exprId == ff.exprId =>
        L2Squared(a, b)
    }

  /** Idempotently add this rule to the session's extra optimizations. */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.contains(this))
      spark.experimental.extraOptimizations = existing :+ this
  }
}
