package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.MatchExpressions.JaroWinkler

/** Optimizer rule: prepend a cheap LENGTH guard to high-threshold
  * Jaro-Winkler filters, so the O(|a|·|b|) similarity kernel only runs on
  * pairs that can possibly clear the threshold.
  *
  * Soundness (why the guard cannot drop a qualifying pair): with
  * m ≤ min(|a|,|b|) matches, jaro ≤ (m/|a| + m/|b| + 1)/3 ≤ (2 + r)/3
  * where r = min/max length ratio; the Winkler boost (prefix ≤ 4, weight
  * 0.1) gives jw ≤ 0.6·jaro + 0.4. So jw ≥ t forces
  * r ≥ 3·(t - 0.4)/0.6 - 2 = 5t - 4 — a pure length condition. It is
  * non-vacuous only for t > 0.8 (else 5t - 4 ≤ 0), which is exactly the
  * near-duplicate regime where the pre-filter pays.
  *
  * The guard conjunct is placed FIRST in the conjunction so codegen's
  * left-to-right && short-circuits before evaluating the kernel. The
  * rewrite is a pure strengthening by an implied predicate — results are
  * bit-identical with or without the rule (Advanced5Spec pins both the
  * equivalence and the soundness bound by fuzz).
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule) and,
  * for already-built sessions, `spark.experimental.extraOptimizations`
  * (see [[enable]]). Idempotent: a Filter whose condition already
  * contains a semantically-equal guard is left untouched — safe under
  * fixpoint iteration and double registration.
  */
object JaroWinklerPruning extends Rule[LogicalPlan] {

  /** min(len(a),len(b)) >= (5t-4) * max(len(a),len(b)), built once per
    * matched predicate.
    */
  private def lengthGuard(a: Expression, b: Expression, t: Double): Expression = {
    val la = Cast(Length(a), DoubleType)
    val lb = Cast(Length(b), DoubleType)
    GreaterThanOrEqual(Least(Seq(la, lb)),
      Multiply(Literal(5 * t - 4, DoubleType), Greatest(Seq(la, lb))))
  }

  /** Split a condition into its top-level AND conjuncts. Only these may
    * yield guards: a JW threshold nested under OR / NOT / CASE does NOT
    * imply the length bound for the whole condition (the other branch
    * may admit rows the guard would reject), so descending past anything
    * but And would make the rewrite unsound.
    */
  private def topLevelConjuncts(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => topLevelConjuncts(l) ++ topLevelConjuncts(r)
    case other     => Seq(other)
  }

  private def guardFor(conjunct: Expression): Option[Expression] = conjunct match {
    case GreaterThanOrEqual(JaroWinkler(a, b), Literal(t: Double, DoubleType))
        if t > 0.8 => Some(lengthGuard(a, b, t))
    case GreaterThan(JaroWinkler(a, b), Literal(t: Double, DoubleType))
        if t > 0.8 => Some(lengthGuard(a, b, t))
    case LessThanOrEqual(Literal(t: Double, DoubleType), JaroWinkler(a, b))
        if t > 0.8 => Some(lengthGuard(a, b, t))
    case LessThan(Literal(t: Double, DoubleType), JaroWinkler(a, b))
        if t > 0.8 => Some(lengthGuard(a, b, t))
    case _ => None
  }

  private def guardsFor(cond: Expression): Seq[Expression] = {
    val raw = topLevelConjuncts(cond).flatMap(guardFor)
    // dedupe semantically-equal guards (same pair matched by two shapes)
    raw.foldLeft(Seq.empty[Expression]) { (acc, g) =>
      if (acc.exists(_.semanticEquals(g))) acc else acc :+ g
    }
  }

  /** Guard-first conjunction: codegen's && short-circuits left-to-right,
    * so the cheap length test runs before the similarity kernel.
    */
  private def strengthen(cond: Expression): Option[Expression] = {
    val guards = guardsFor(cond)
      .filterNot(g => cond.exists(_.semanticEquals(g)))
    if (guards.isEmpty) None else Some(And(guards.reduce(And.apply), cond))
  }

  // match BOTH shapes: a standalone Filter, and a predicate that
  // PushPredicateThroughJoin already folded into a join condition
  // (the normal resting place by the time a late batch runs)
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      strengthen(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      strengthen(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }

  /** Attach to an already-built session (extraOptimizations runs as a
    * late batch; the guard still short-circuits inside the Filter).
    * Safe to call repeatedly.
    */
  def enable(spark: org.apache.spark.sql.SparkSession): Unit =
    OptimizerRules.attach(spark, this)
}
