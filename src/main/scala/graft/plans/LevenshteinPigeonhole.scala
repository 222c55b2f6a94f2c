package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: conjoin the lossless length pigeonhole to any
  * edit-distance threshold filter.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (each edit changes the length by at most one), so the guard can be
  * added to the filter without changing its result — and evaluating it
  * FIRST skips the O(k·min(|a|,|b|)) DP entirely for length-mismatched
  * rows, which in blocked fuzzy joins is most of them. The linkage
  * module applies this by hand (`Linkage.fuzzyPairs`); this rule gives
  * every ad-hoc `filter(levenshtein(...) <= k)` the same treatment
  * automatically — the kind of domain rewrite `SparkSessionExtensions`
  * exists for.
  *
  * Idempotent: a guard that is already present (semantically) is not
  * re-added, so the rule is stable under the optimizer's
  * run-to-fixpoint batches.
  */
object LevenshteinPigeonhole extends Rule[LogicalPlan] with PredicateHelper {

  private def guardFor(a: Expression, b: Expression,
      k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val guards = conjuncts.flatMap {
        // Only the UN-thresholded levenshtein(a, b) form is rewritten.
        // The 3-arg form levenshtein(a, b, t) returns -1 when the
        // distance exceeds t, so `levenshtein(a, b, t) <= k` keeps
        // every over-threshold row (-1 <= k) regardless of its length
        // gap — the pigeonhole guard is NOT implied and conjoining it
        // would drop rows the filter keeps. (No threshold value makes
        // it safe: rows with distance > t pass the filter via -1 with
        // arbitrary length difference.)
        // lev <= k and lev < k both imply the <= k length bound
        case LessThanOrEqual(Levenshtein(a, b, None),
            k @ Literal(_, IntegerType)) => Some(guardFor(a, b, k))
        case LessThan(Levenshtein(a, b, None),
            k @ Literal(_, IntegerType)) => Some(guardFor(a, b, k))
        case GreaterThanOrEqual(k @ Literal(_, IntegerType),
            Levenshtein(a, b, None)) => Some(guardFor(a, b, k))
        case _ => None
      }.distinct
        .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      if (guards.isEmpty) f
      else Filter(guards.foldLeft(cond)((c, g) => And(g, c)), child)
  }
}
