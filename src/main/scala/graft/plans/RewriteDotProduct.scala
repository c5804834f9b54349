package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, Cast, ZipWith, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProductExpr

/** Optimizer rule: rewrite the composed dot-product idiom
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, v) => acc + v)`
  * into the native [[DotProductExpr]].
  *
  * Why a Rule and not just an API: `ArrayAggregate` is a `CodegenFallback` —
  * ANY query spelling the dot product with higher-order functions (users
  * porting reference pipelines, ad-hoc SQL) silently loses whole-stage
  * codegen for its entire projection AND pays a zip_with array allocation
  * per row. This rule recognizes the exact pattern and swaps in the
  * allocation-free codegen'd expression; semantics are identical
  * (DotProductSpec proves equivalence, RewriteDotProductSpec proves the
  * rewrite fires and agrees).
  *
  * The match is deliberately conservative: float/double arrays, literal 0.0
  * zero, a pure two-variable product merge (optionally under double casts),
  * and an identity finish lambda. Anything else is left untouched.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def numericArray(e: Expression): Boolean = e.resolved && (e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  })

  /** The lambda variable under an optional to-double cast. */
  private def asVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable => Some(v)
    case c: Cast => c.child match {
      case v: NamedLambdaVariable if c.dataType == DoubleType => Some(v)
      case _ => None
    }
    case _ => None
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(left, right,
          LambdaFunction(m: Multiply,
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(zero: Double, DoubleType),
        LambdaFunction(add: org.apache.spark.sql.catalyst.expressions.Add,
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        finish)
      if zero == 0d && isIdentity(finish) &&
        // the product must already be a DOUBLE multiply: a float-typed
        // Multiply rounds (or overflows to Inf) per element, and rewriting
        // it to the double-widening native form would change results
        m.dataType == DoubleType &&
        numericArray(left) && numericArray(right) &&
        asVar(m.left).exists(_.exprId == x.exprId) &&
        asVar(m.right).exists(_.exprId == y.exprId) &&
        asVar(add.left).exists(_.exprId == acc.exprId) &&
        asVar(add.right).exists(_.exprId == v.exprId) =>
      DotProductExpr(left, right)
  }
}
