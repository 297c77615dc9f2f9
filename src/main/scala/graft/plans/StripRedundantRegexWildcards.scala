package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Literal, RLike}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.router.Router

/** Optimizer rule: strip semantically-redundant leading/trailing `.*` from
  * foldable RLIKE patterns. `find(".*X.*") ≡ find("X")` — but Java regex
  * backtracks, making the leading `.*` O(n²) on misses (17× measured on
  * the reference's CIDR pattern, DESIGN.md §3). The router core applies
  * the same rewrite at plan-compile; registering it as a Rule extends the
  * win to ANY query using rlike, including raw `spark.sql`.
  *
  * Conservative by construction: delegates to
  * `Router.stripRedundantWildcards`, which only strips bare greedy
  * wrappers (no anchors, no lazy quantifiers, no escaped dots) and never
  * strips to empty.
  */
object StripRedundantRegexWildcards extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case r @ RLike(_, Literal(p: UTF8String, StringType)) =>
        val stripped = Router.stripRedundantWildcards(p.toString)
        if (stripped != p.toString)
          r.copy(right = Literal(UTF8String.fromString(stripped), StringType))
        else r
    }

  /** Install on a live session (extraOptimizations) — the runtime
    * counterpart of listing the rule in GraftExtensions.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
