package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.DotProductLong

/** Optimizer rule canonicalizing the higher-order-function dot-product
  * idiom
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, v) => acc + v) }}}
  * into the fused [[DotProductLong]] loop, for `array<bigint>` inputs
  * with non-null elements. User code written with built-ins gets the
  * native expression automatically (installed via GraftExtensions).
  *
  * Soundness: zip_with null-pads when lengths differ, which nulls the
  * whole aggregate; DotProductLong returns null on length mismatch, so
  * results agree. Element-null inputs are excluded by the containsNull
  * check (a null element would null the aggregate, which the fused loop
  * cannot see).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isLongArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(mx, my, _), Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0L, LongType),
          LambdaFunction(Add(ax, ay, _), Seq(ma: NamedLambdaVariable, mv: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fa: NamedLambdaVariable), _))
        if isLongArrayNoNulls(l) && isLongArrayNoNulls(r) &&
          isVar(mx, zx) && isVar(my, zy) &&
          isVar(ax, ma) && isVar(ay, mv) &&
          isVar(fin, fa) =>
        DotProductLong(l, r)
    }
}
