package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.DotProductLong

/** Optimizer rule: rewrite the naive higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, x) -> s + x) }}}
  *
  * into the engine's codegen kernel [[graft.functions.DotProductLong]]
  * (`dot_product_l`). Spark evaluates HOF lambdas interpreted — one
  * closure call per element — while the kernel is a primitive `long`
  * loop inside whole-stage codegen; on 100 TB of embeddings the
  * per-element interpretation overhead dominates the scan. With this
  * rule a user who writes the natural SQL spelling gets the kernel
  * automatically; registered via
  * `SparkSessionExtensions.injectOptimizerRule` in
  * [[graft.GraftExtensions]].
  *
  * The rewrite fires only when it is semantics-preserving on well-formed
  * data:
  *   - both sides are `array<bigint>` with non-nullable elements
  *     (nullable elements would make the HOF yield null where the
  *     kernel cannot);
  *   - the fold zero is the literal `0L`;
  *   - the merge lambda is exactly `+` over its two variables and the
  *     zip lambda exactly `*` over its two variables (either operand
  *     order — both are commutative);
  *   - the finish lambda is the identity.
  *
  * Overflow semantics are preserved per eval mode: ANSI-mode
  * arithmetic rewrites to the CHECKED kernel (`VecUtil.dotLExact`,
  * Math.*Exact — raises on overflow like ANSI promises), LEGACY to
  * the wrapping kernel. TRY-mode arithmetic (`try_multiply`/
  * `try_add`, lowered to `Multiply`/`Add` with `EvalMode.TRY` before
  * optimizer rules run) is NOT rewritten at all: TRY promises
  * null-on-overflow, which neither kernel can honor. The one
  * remaining delta, shared with the explicit `dot_product_l`
  * contract: ragged pairs (different vector lengths) raise instead
  * of yielding null (`zip_with` pads the short side with nulls; the
  * kernels fail loudly — see VecUtil.dotL).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isStrictLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  private def isZeroLong(e: Expression): Boolean =
    e.dataType == LongType && e.foldable && (e.eval() match {
      case l: java.lang.Long => l.longValue() == 0L
      case _ => false
    })

  private def sameVar(e: Expression, v: NamedExpression): Boolean = e match {
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case _ => false
  }

  /** body is exactly `p ∘ q` over the two lambda variables, either
    * order (both matched operators are commutative). */
  private def isPairOp(l: Expression, r: Expression,
      args: Seq[NamedExpression]): Boolean = args match {
    case Seq(p, q) =>
      (sameVar(l, p) && sameVar(r, q)) || (sameVar(l, q) && sameVar(r, p))
    case _ => false
  }

  private def notTry(ctx: NumericEvalContext): Boolean =
    ctx.evalMode != EvalMode.TRY

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(ml, mr, mulCtx), mulArgs, _)),
            zero,
            LambdaFunction(Add(al, ar, addCtx), addArgs, _),
            LambdaFunction(finBody, Seq(finArg), _))
          if isStrictLongArray(a) && isStrictLongArray(b) &&
            isZeroLong(zero) &&
            notTry(mulCtx) && notTry(addCtx) &&
            isPairOp(ml, mr, mulArgs) &&
            isPairOp(al, ar, addArgs) &&
            sameVar(finBody, finArg) =>
        // checked kernel under ANSI so error-on-overflow is kept
        val ansi = mulCtx.evalMode == EvalMode.ANSI ||
          addCtx.evalMode == EvalMode.ANSI
        DotProductLong(a, b, checked = ansi)
    }
}
