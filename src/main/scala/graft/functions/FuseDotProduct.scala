package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** SURVEY.md §2.10 D5 / §4 — optimizer rule fusing the declarative
  * dot-product idiom into the native kernel:
  *
  *   aggregate(zip_with(a, b, (x, y) -> cast(x) * cast(y)), 0.0,
  *             (acc, v) -> acc + v)                      [identity finish]
  *     ⇒ dot_product(a, b)
  *
  * Users keep writing the composable higher-order form; every query
  * containing it (similarity joins, norms, IVF assignment) silently gets
  * the fused zero-allocation loop. The match is deliberately strict —
  * float arrays, double-cast multiply on the zip-with variables, 0.0
  * seed, plain add merge, identity finish — because a rewrite that fires
  * on anything semantically different is a correctness bug, not an
  * optimization. [[DotProduct]] reproduces the composed form's null and
  * fold-order semantics bit-for-bit, which is what makes the rewrite
  * sound (the oracle gate proves it end-to-end on every j5/x29 query).
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(
              Multiply(Cast(xv: NamedLambdaVariable, DoubleType, _, _),
                       Cast(yv: NamedLambdaVariable, DoubleType, _, _), _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(av: NamedLambdaVariable, ev: NamedLambdaVariable, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fv: NamedLambdaVariable, Seq(f: NamedLambdaVariable), _))
        if isFloatArray(a) && isFloatArray(b) &&
          xv.exprId == x.exprId && yv.exprId == y.exprId &&
          av.exprId == acc.exprId && ev.exprId == el.exprId &&
          fv.exprId == f.exprId =>
      DotProduct(a, b)
  }
}
