package graft.plans

import graft.functions.NativeExpressions.RegexpCount
import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: `size(regexp_extract_all(s, pattern, 0))` →
  * [[RegexpCount]] — count matches without allocating a per-match string
  * array and an UnsafeArrayData per row.
  *
  * Measured at sf0.1 (docs ≤ 99 tokens): perf-neutral — regex search time
  * dominates and the avoided array is small. The rewrite's value is (a)
  * the allocation it removes grows with document length (a 100 KB doc
  * materializes a ~20k-element array just to take its size), and (b) it
  * exercises the third extension level (expression → SQL function →
  * logical-plan rule) end-to-end with guarded semantics.
  *
  * Guarded to the exact cases where semantics are bit-identical:
  *   - group index must be literal 0 (a higher index errors at runtime on
  *     a group-less pattern — the rewrite must not swallow that error);
  *   - the pattern must be a non-null string literal (compiled once);
  *   - `legacySizeOfNull` must be off (legacy `size(null) = -1` differs
  *     from the null-propagating kernel).
  *
  * Registered via [[GraftExtensions]]'s `injectOptimizerRule` — the
  * demonstration of the third extension level (expression → SQL function
  * → logical-plan rule).
  */
object RegexpCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(RegExpExtractAll(subject, Literal(p: UTF8String, StringType), Literal(0, _)), false)
        if p != null =>
      RegexpCount(subject, p.toString)
  }
}
