package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (preference ladder step (c), the `Rule[LogicalPlan]`
  * altitude): rewrites the hand-composed cosine pattern
  *
  *   float_dot(a, b) / (sqrt(float_dot(a, a)) * sqrt(float_dot(b, b)))
  *
  * into the fused [[FloatCosine]] expression, which accumulates all three
  * sums in ONE generated loop instead of traversing both arrays three
  * times. The rewrite is semantics-preserving bit-for-bit: FloatCosine
  * evaluates exactly `dot / (sqrt(na) * sqrt(nb))` with the same
  * per-accumulator left-to-right IEEE order as the composed form
  * (ExpressionSpec pins the parity), and on a zero norm product it mirrors
  * `Divide` exactly — NULL in legacy mode, divide-by-zero error under ANSI
  * (`FloatCosine.failOnError`, captured from the active conf when the rule
  * fires, just as the replaced Divide captured it at analysis) — so a plan
  * rewritten here hash-matches the un-rewritten one on ALL inputs,
  * zero-norm vectors included (ExpressionSpec pins this too).
  *
  * Matching is on `semanticEquals` (cosmetic differences — aliases, case —
  * don't block the fuse) and both factor orders of the norm product are
  * recognized. Registered via `injectOptimizerRule` in [[GraftExtensions]]
  * and via `spark.experimental.extraOptimizations` for already-built
  * sessions; users can then write the textbook formula in SQL and still
  * get the fused loop.
  */
object CosineFuseRule extends Rule[LogicalPlan] {

  private def fuse(dot: FloatDotProduct, n1: Expression, n2: Expression)
      : Option[Expression] = (n1, n2) match {
    case (FloatDotProduct(a1, a2), FloatDotProduct(b1, b2))
        if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
          ((dot.left.semanticEquals(a1) && dot.right.semanticEquals(b1)) ||
            (dot.left.semanticEquals(b1) && dot.right.semanticEquals(a1))) =>
      Some(FloatCosine(dot.left, dot.right))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d @ Divide(dot: FloatDotProduct,
          Multiply(Sqrt(n1), Sqrt(n2), _), _) =>
        fuse(dot, n1, n2).getOrElse(d)
    }
}
