package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Expression, ExpressionInfo, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Catalyst optimizer rule: rewrite the pure-builtin dot-product shape
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd [[graft.functions.DotProduct]] expression. The
  * builtin form runs the lambda interpreter per element and allocates an
  * intermediate array per row (~3x end-to-end on pair joins); after this
  * rule any user writing the idiomatic higher-order-function spelling
  * gets the fused loop automatically. Semantics are identical: both sum
  * sequentially in array order over the same double products.
  *
  * The match is deliberately conservative: exact double-typed arrays, a
  * multiply of exactly the two zip-lambda variables, a literal 0.0 zero,
  * an add of exactly the two merge-lambda variables, and an identity
  * finish lambda — anything else is left untouched.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVarPair(
      e: Expression, f: LambdaFunction,
      combine: (Expression, Expression) => Boolean): Boolean =
    f.arguments match {
      case Seq(a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        combine(a, b) || combine(b, a)
      case _ => false
    }

  private def multipliesItsArgs(f: LambdaFunction): Boolean = f.function match {
    case Multiply(l, r, _) =>
      isVarPair(f.function, f, (a, b) =>
        (l.semanticEquals(a) && r.semanticEquals(b)))
    case _ => false
  }

  private def addsItsArgs(f: LambdaFunction): Boolean = f.function match {
    case Add(l, r, _) =>
      isVarPair(f.function, f, (a, b) =>
        (l.semanticEquals(a) && r.semanticEquals(b)))
    case _ => false
  }

  private def isIdentity(f: LambdaFunction): Boolean =
    (f.arguments, f.function) match {
      case (Seq(a: NamedLambdaVariable), v: NamedLambdaVariable) =>
        v.semanticEquals(a)
      case _ => false
    }

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, mul: LambdaFunction),
            Literal(0.0, DoubleType),
            merge: LambdaFunction,
            finish: LambdaFunction)
          if doubleArray(a) && doubleArray(b) &&
            multipliesItsArgs(mul) && addsItsArgs(merge) &&
            isIdentity(finish) =>
        DotProduct(a, b)
    }
}

/** Session-extension entry points.
  *
  *  - Deployment: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *    registers the `vec_dot` SQL function and injects
  *    [[RewriteHofDotProduct]] into the optimizer of every new session.
  *  - Live session (tests, notebooks): [[GraftExtensions.install]] applies
  *    the same two pieces to an already-built session via
  *    `experimental.extraOptimizations` + the function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(
        classOf[graft.functions.WinnowFingerprints].getName, "winnow_fps"),
      (exprs: Seq[Expression]) => graft.functions.WinnowFingerprints(
        exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectPlannerStrategy(_ => new AsOfJoinStrategy)
  }
}

object GraftExtensions {
  def install(spark: SparkSession): Unit = {
    graft.functions.VectorFunctions.register(spark)
    NativeAsOf.install(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    }
  }
}
