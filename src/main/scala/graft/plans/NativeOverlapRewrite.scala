package graft.plans

import graft.functions.OverlapCount
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Optimizer rule: `size(array_intersect(a, b))` →
  * [[graft.functions.OverlapCount]] when only the intersection's
  * CARDINALITY is consumed — the Jaccard hot path. Conditions, all
  * required for drop-in equality:
  *
  *   - `legacySizeOfNull = false` (size(NULL) = NULL, matching
  *     OverlapCount's null contract; the legacy -1 mode must keep the
  *     builtin);
  *   - element type string/integral/boolean/date/timestamp (float set
  *     ops normalize NaN/-0.0 — excluded).
  *
  * The rewrite removes the per-row intersected-ArrayData allocation and
  * (for foldable right sides, e.g. literal profiles) hashes the constant
  * side once per task instead of once per row.
  */
object NativeOverlapRewrite extends Rule[LogicalPlan] {

  private def elemType(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.types.DataType] = e.dataType match {
    case ArrayType(t, _) => Some(t)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // compare ELEMENT types only — containsNull routinely differs
      // between a column array (true) and a literal array (false), and
      // requiring full ArrayType equality would silently skip the
      // literal-dictionary case this rule exists for
      case Size(ArrayIntersect(l, r), false)
          if elemType(l).exists(t =>
            OverlapCount.supportedElem(t) && elemType(r).contains(t)) =>
        OverlapCount(l, r)
    }
}
