package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Cast, Expression, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** Optimizer rule: `size(array_intersect(a, b))` → native
  * [[SortedIntersectCount]] when both sides are provably sorted distinct
  * string arrays (literally `sort_array(array_distinct(...))` — the
  * canonical token-set shape).
  *
  * `array_intersect` builds a per-row hash set and materializes the
  * intersection array only for its size to be taken; the rewrite computes
  * the count with a zero-allocation sorted merge instead. Users writing
  * plain declarative Spark get the fast path without knowing it exists —
  * the Catalyst-idiomatic way to ship an optimization.
  *
  * Conservative by construction: fires only on the exact provably-safe
  * pattern (sorted ascending, deduped, string element type, and
  * `containsNull=false`). The null restriction is semantic, not cosmetic:
  * `array_intersect` counts a null element shared by both sides while the
  * sorted merge skips nulls, so rewriting a null-bearing array would change
  * the user's result by one. `split()` et al. produce containsNull=false,
  * so the common token-set shape still qualifies.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def isSortedDistinctStrings(e: Expression): Boolean = e match {
    case SortArray(ArrayDistinct(child), asc) =>
      (asc match {
        case l: org.apache.spark.sql.catalyst.expressions.Literal => l.value == true
        case _ => false
      }) && (child.dataType match {
        case ArrayType(StringType, containsNull) => !containsNull
        case _ => false
      })
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(a, b), legacy)
        if isSortedDistinctStrings(a) && isSortedDistinctStrings(b) && !legacy =>
      Cast(SortedIntersectCount(a, b), IntegerType)
  }

  /** Install into an existing session (extraOptimizations) — the
    * config-time route is [[GraftSparkExtensions]]. Idempotent. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
  }
}
