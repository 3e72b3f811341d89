package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §4.3 extension surface): rewrite
  * `dot_product_float(x, x)` — the self dot every norm/cosine builds —
  * into the single-child [[Norm2Float]], which evaluates the array
  * subtree once instead of twice. Semantics are bit-identical (same fold
  * order, same null propagation; asserted in VectorExprSpec), so the
  * rewrite is purely an efficiency rule, and being a logical-plan rule
  * it fires for the Column API and for SQL (`GraftExtensions` injects it
  * into every session). `semanticEquals` (not `==`) matches
  * cosmetically-different but equivalent subtrees, mirroring how
  * Spark's own CSE decides reuse. */
object RewriteSelfDotToNorm2 extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProductFloat(a, b) if a.semanticEquals(b) => Norm2Float(a)
    }
}
