package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: recognize the declarative squared-distance fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
  *               0L, (acc, t) -> acc + t) }}}
  *
  * over two bigint arrays and replace it with the codegen'd
  * [[SqDistExpr]] kernel — one tight JVM loop instead of ~3·dims
  * interpreted lambda dispatches per row, with bit-identical output
  * (exact integer arithmetic, same in-order accumulation).
  *
  * This is the engine's expression-optimization seam: callers keep
  * writing the portable HOF formulation (it is also what the DuckDB
  * oracle mirrors), and the plan gets the kernel automatically —
  * [[graft.sim.KMeans]]'s assignment step is the motivating site. The
  * match is conservative: every lambda variable is checked by exprId,
  * the zero must be literal 0L, and both arrays must be bigint-typed —
  * anything else is left untouched.
  */
object RewriteSqDist extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def sameVar(a: Expression, b: NamedLambdaVariable): Boolean = a match {
    case v: NamedLambdaVariable => v.exprId == b.exprId
    case _ => false
  }

  /** (x, y) -> (x - y) * (x - y), both factors over the same pair.
    * Returns the lambda's uniform arithmetic evalMode, or None if the
    * shape doesn't match or the three ops disagree. */
  private def sqDiffMode(f: Expression): Option[EvalMode.Value] = f match {
    case LambdaFunction(
        Multiply(Subtract(x1, y1, m1), Subtract(x2, y2, m2), m3),
        Seq(px: NamedLambdaVariable, py: NamedLambdaVariable), _)
        if sameVar(x1, px) && sameVar(x2, px) &&
          sameVar(y1, py) && sameVar(y2, py) &&
          m1.evalMode == m2.evalMode && m2.evalMode == m3.evalMode =>
      Some(m1.evalMode)
    case _ => None
  }

  /** (acc, t) -> acc + t (either operand order) → the Add's evalMode. */
  private def sumMode(f: Expression): Option[EvalMode.Value] = f match {
    case LambdaFunction(Add(m1, m2, mode),
        Seq(pa: NamedLambdaVariable, pt: NamedLambdaVariable), _)
        if (sameVar(m1, pa) && sameVar(m2, pt)) ||
          (sameVar(m1, pt) && sameVar(m2, pa)) =>
      Some(mode.evalMode)
    case _ => None
  }

  /** acc -> acc (the implicit identity finish of 3-arg aggregate). */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(p: NamedLambdaVariable), _) =>
      v.exprId == p.exprId
    case _ => false
  }

  /** The rewrite only fires when all four arithmetic ops share one mode
    * and that mode has a kernel twin: LEGACY → wrapping [[VectorKernels
    * .sqDistLong]], ANSI → [[VectorKernels.sqDistLongExact]] (overflow
    * raises, as the fold would). TRY (overflow → NULL mid-expression)
    * has no kernel twin and is left untouched — an optimizer rule must
    * be invisible to results, including the error/overflow regime. */
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, mapF), Literal(0L, LongType), mergeF, finishF)
          if isLongArray(a) && isLongArray(b) && isIdentity(finishF) &&
            sqDiffMode(mapF).exists(m =>
              sumMode(mergeF).contains(m) && m != EvalMode.TRY) =>
        SqDistExpr(a, b, failOnError = sqDiffMode(mapF).contains(EvalMode.ANSI))
    }
}
