package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic program
  * per row and then compares. Spark's 3-arg `levenshtein(a, b, k)` runs the
  * banded O(k·max(|a|,|b|)) DP and returns -1 as soon as the distance
  * provably exceeds k — but users (and generated SQL) overwhelmingly write
  * the 2-arg form. This rule rewrites, inside any Filter:
  *
  *   levenshtein(a, b) <= k   (k a non-negative int literal)
  *      ==>  abs(length(a) - length(b)) <= k  AND  levenshtein(a, b, k) >= 0
  *
  * Semantics-preserving: |len(a)-len(b)| is a lower bound on edit distance,
  * and `bounded >= 0` iff distance <= k (the bounded form yields -1 above
  * the threshold). NULL inputs stay NULL through both forms, so tri-state
  * filter behaviour is unchanged. The added length band is a cheap
  * codegen'd prune that fires before the DP — on a fuzzy nested-loop join
  * (q72's shape) it eliminates most candidate pairs at 100 TB scale.
  *
  * Idempotent by construction: the rewritten predicate uses the 3-arg
  * (threshold = Some) form, which the pattern no longer matches — safe
  * under the optimizer's fixed-point batches.
  */
object LevenshteinRewrite extends Rule[LogicalPlan] {

  private def bounded(e: Levenshtein, k: Literal): Expression = {
    val band = LessThanOrEqual(Abs(Subtract(Length(e.left), Length(e.right))), k)
    val thresholded = GreaterThanOrEqual(
      Levenshtein(e.left, e.right, Some(k)), Literal(0))
    And(band, thresholded)
  }

  private def rewriteCond(cond: Expression): Expression = cond transform {
    case LessThanOrEqual(lev @ Levenshtein(_, _, None), k @ Literal(v: Int, IntegerType))
        if v >= 0 =>
      bounded(lev, k)
    case GreaterThanOrEqual(k @ Literal(v: Int, IntegerType), lev @ Levenshtein(_, _, None))
        if v >= 0 =>
      bounded(lev, k)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      val rewritten = rewriteCond(cond)
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = rewriteCond(cond)
      if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
  }
}
