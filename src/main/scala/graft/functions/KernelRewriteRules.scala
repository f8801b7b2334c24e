package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  ArrayTransform, Cast, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rules that swap well-known interpreted higher-order-function
  * idioms for the engine's fused native kernels — the §7.3 tier-(c) path:
  * a `Rule[LogicalPlan]` injected through `SparkSessionExtensions`
  * ([[GraftExtensions]]), so users writing plain SQL get kernel
  * performance without knowing the kernels exist.
  *
  * First (and currently only) rewrite: the dot-product idiom
  *
  * {{{
  * aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *           0D, (acc, v) -> acc + v)
  * }}}
  *
  * becomes `vec_dot(a, b)`. Spark evaluates that HOF tree interpreted,
  * per element, per row; the kernel is one codegen'd loop. The rewrite is
  * semantics-preserving because both sides promote to double BEFORE the
  * multiply (a float-multiply lambda rounds differently and is NOT
  * rewritten), both accumulate in index order, and unequal lengths and
  * null elements yield NULL in both forms.
  */
object KernelRewriteRules {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** The lambda operand is `v` promoted to double: either `CAST(v AS
    * DOUBLE)` or `v` already of DoubleType.
    */
  private def doubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId && nv.dataType == DoubleType
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  private def numericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true // kernel handles null
    case _ => false                                   // elements (→ NULL)
  }

  object RewriteHofDotProduct extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(ma, mb, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(aa, ab, _),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(facc: NamedLambdaVariable), _))
          if numericArray(a) && numericArray(b) &&
            ((doubleOf(ma, x) && doubleOf(mb, y)) ||
              (doubleOf(ma, y) && doubleOf(mb, x))) &&
            ((sameVar(aa, acc) && sameVar(ab, el)) ||
              (sameVar(aa, el) && sameVar(ab, acc))) &&
            sameVar(fin, facc) =>
        VectorExpressions.DotProduct(a, b)

      // the squared-norm idiom:
      //   aggregate(transform(a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
      //             0D, (acc, v) -> acc + v)
      // → vec_dot(a, a) — same promotion/order/null reasoning as above
      case ArrayAggregate(
            ArrayTransform(a,
              LambdaFunction(Multiply(ma, mb, _),
                Seq(x: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(aa, ab, _),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(facc: NamedLambdaVariable), _))
          // a.deterministic: DotProduct(a, a) evaluates the child TWICE —
          // duplicating a non-deterministic array (shuffle(...), rand-
          // derived) would dot two DIFFERENT values. (For deterministic
          // children — almost always a column reference — the duplicate
          // evaluation is free-to-cheap and the kernel still wins.)
          if numericArray(a) && a.deterministic &&
            doubleOf(ma, x) && doubleOf(mb, x) &&
            ((sameVar(aa, acc) && sameVar(ab, el)) ||
              (sameVar(aa, el) && sameVar(ab, acc))) &&
            sameVar(fin, facc) =>
        VectorExpressions.DotProduct(a, a)
    }
  }
}
