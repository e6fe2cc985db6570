package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrites the idiomatic Column-API dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, e) => acc + e)
  *
  * into the native codegen'd [[DotProduct]]. The fold executes as a
  * CodegenFallback higher-order-function tree (a closure call per
  * element, an intermediate zipped array); the native expression is
  * one generated loop inside whole-stage codegen. Numeric parity is
  * exact — [[VectorOps.dot]] accumulates left-to-right like the fold,
  * and mismatched lengths yield null either way — so the rewrite is a
  * pure performance transform: users writing the declarative fold get
  * the native kernel without knowing it exists.
  *
  * Injected via [[GraftExtensions]] (`spark.sql.extensions`).
  */
object FoldToNativeVectorOps extends Rule[LogicalPlan] {

  private def sameVars(f: Expression, args: Seq[NamedLambdaVariable]): Boolean =
    f match {
      case Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _) =>
        args.map(_.exprId) == Seq(x.exprId, y.exprId)
      case Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _) =>
        args.map(_.exprId) == Seq(x.exprId, y.exprId)
      case _ => false
    }

  private def isIdentity(l: LambdaFunction): Boolean = l match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  /** Only null-free arrays are eligible: with a null ELEMENT the fold
    * returns null (null poisons the sum) while the native kernel would
    * read a raw 0.0 slot — rewriting would change results, not just
    * speed. containsNull=false is the static guarantee. */
  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(mul, mulArgs, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add, addArgs, _),
          finish: LambdaFunction)
        if doubleArray(a) && doubleArray(b) &&
          sameVars(mul, mulArgs.collect { case v: NamedLambdaVariable => v }) &&
          mul.isInstanceOf[Multiply] &&
          sameVars(add, addArgs.collect { case v: NamedLambdaVariable => v }) &&
          add.isInstanceOf[Add] &&
          isIdentity(finish) =>
      DotProduct(a, b)
  }
}
